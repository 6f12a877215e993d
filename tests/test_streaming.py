"""Streaming-specific semantics tests (SURVEY §5.2(3,5)).

The oracle harness already checks every streaming query end-to-end against
DuckDB (including watermark/session eviction encoded as SQL predicates); this
file pins the *mechanics* the oracle can't see: watermark state eviction and
the exact late-row drop rule.

Empirically pinned semantics (matters for anyone extending the engine):
the watermark does NOT strictly filter late input — a late row is still
merged if its window's state is live (Spark guarantees only that data newer
than the watermark is never dropped). A late row is dropped exactly when its
window was already evicted in a PRIOR micro-batch.
"""

from __future__ import annotations

import datetime as dt
import time

import pyspark.sql.functions as F


def test_watermark_drops_late_rows(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def write_slice(rows):
        spark.createDataFrame(
            [(ts, float(v)) for ts, v in rows], "ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "replay"))
        time.sleep(1.05)  # distinct mtimes → one slice per micro-batch

    # batch 0: window [10:00,10:15) gets 2 rows; 10:59 row → wm 10:49 next
    write_slice(
        [(base, 1), (base + dt.timedelta(minutes=5), 2), (base + dt.timedelta(minutes=59), 4)]
    )
    # batch 1 (wm=10:49): [10:00,10:15) evicted+emitted with n=2; 11:30 row
    # pushes wm to 11:20 for the next batch
    write_slice([(base + dt.timedelta(minutes=90), 8)])
    # batch 2 (wm=11:20): 10:07 is late AND its window state is gone → dropped
    write_slice([(base + dt.timedelta(minutes=7), 100)])

    agg = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "replay"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["window"]["start"].minute: (r["n"], r["total"])
        for r in spark.table("late_test").collect()
    }
    # [10:00,10:15): n=2 — the late 100 arrived after eviction, dropped.
    # [10:45,11:00): the 10:59 row, emitted once wm (11:20) passed 11:00.
    # [11:30,11:45): withheld — final wm 11:20 hasn't passed 11:45.
    assert got == {0: (2, 3.0), 45: (1, 4.0)}


def test_windowed_agg_state_bounded_by_key_space(spark, tmp_path):
    """The 100 TB streaming claim, verified on the runtime metric rather
    than asserted in prose (r7 verdict task 6 'state-bound verification'):
    a watermarked tumbling-window aggregation holds state keyed by
    (window, event_type) — PEAK state rows (stateOperators numRowsTotal
    across every micro-batch) must be bounded by the distinct key space
    and therefore independent of replay VOLUME (the x1→x4 blow-ups
    replicate rows within the same time span: rows 4×, key space fixed —
    which is why the wave-4 scale study measured slope ≈ 0 for this
    family). Run at sf0.01, where keys (7 206) << rows (10 000) so the
    bound is informative, not vacuous."""
    import pyspark.sql.functions as F

    from stockmarket_bigdata_project_spark.catalog import load_table
    from stockmarket_bigdata_project_spark.streaming.pipelines import (
        WATERMARK, WINDOW, replay_dir,
    )
    from tests.conftest import SF_DIR_CORRECTNESS as SF

    ev = load_table(spark, SF, "events")
    n_rows = ev.count()
    n_keys = (
        ev.select(F.window("ts", WINDOW), "event_type").distinct().count()
    )
    assert n_keys < n_rows  # the bound must be informative at this SF

    agg = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir(spark, SF))
        .withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("state_bound_test")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    peaks = [
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in (p["stateOperators"] or [])
    ]
    rows_in = sum(
        p["numInputRows"] for p in q.recentProgress
    )
    assert rows_in == n_rows  # the whole corpus replayed
    assert peaks, "no stateOperators metrics recorded"
    assert max(peaks) <= n_keys, (
        f"state rows {max(peaks)} exceed the key space {n_keys} — "
        "state is growing with volume, not with keys"
    )
