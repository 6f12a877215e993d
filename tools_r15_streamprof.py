"""Round-15 streaming decomposition workbench (guide §1: measure first).

Rebuilds the stream-stream join pair (and optionally other streaming
queries) exactly as the engine declares them, runs them to a memory sink,
and prints the per-micro-batch StreamingQueryProgress decomposition:
durationMs (addBatch / getBatch / latestOffset / queryPlanning / walCommit /
commitOffsets) plus the stateOperators metrics (numRowsTotal, commit times,
memory) — the evidence base for VERDICT r14 task 4 (trigger/watermark wait
vs compute, and the state-rows-bounded-by-watermark excerpt).

Nothing here feeds the bench artifact — it is a workbench.

Usage:
    python tools_r15_streamprof.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from stockmarket_bigdata_project_spark.session import get_spark
from stockmarket_bigdata_project_spark.streaming import pipelines as P


def _run_traced(stream_df, mode: str, label: str):
    spark = stream_df.sparkSession
    name = f"prof_{label}_{int(time.time() * 1000) % 10**9}"
    chk = tempfile.mkdtemp(prefix="spark_graft_profchk_")
    start = time.perf_counter()
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - start
    print(f"== {label}: wall {wall:.3f}s, {len(q.recentProgress)} progress events")
    agg: dict[str, float] = {}
    for p in q.recentProgress:
        dm = p.get("durationMs") or {}
        for k, v in dm.items():
            agg[k] = agg.get(k, 0.0) + v / 1000.0
        ops = p.get("stateOperators") or []
        srows = [
            (
                o.get("operatorName"),
                o.get("numRowsTotal"),
                o.get("numRowsUpdated"),
                o.get("numRowsRemoved"),
                round((o.get("allUpdatesTimeMs") or 0) / 1000.0, 3),
                round((o.get("commitTimeMs") or 0) / 1000.0, 3),
            )
            for o in ops
        ]
        print(
            f"  batch {p['batchId']}: rows={p.get('numInputRows')} "
            f"durations={json.dumps(dm)} state={srows}"
        )
    print(f"  TOTAL durationMs by phase: {json.dumps({k: round(v, 3) for k, v in sorted(agg.items(), key=lambda kv: -kv[1])})}")
    n_parts = stream_df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    print(f"  (spark.sql.shuffle.partitions={n_parts})")
    return wall


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r15-streamprof")
    # pre-create the replay dir so its one-time cost (4 writes + mtime
    # sleeps) is not charged to the first traced query
    t0 = time.perf_counter()
    P.replay_dir(spark, sf_dir)
    print(f"replay_dir (one-time): {time.perf_counter() - t0:.3f}s")

    for _ in range(reps):
        left, right = P._click_purchase_sides(spark, sf_dir)
        import pyspark.sql.functions as F

        joined = left.join(
            right,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
            "inner",
        ).select(
            "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts",
            "purchase_value",
        )
        _run_traced(joined, "append", "ss_join_inner")

        left2, right2 = P._click_purchase_sides(spark, sf_dir)
        joined2 = left2.join(
            right2,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
            "leftOuter",
        ).select(
            "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts",
            "purchase_value",
        )
        _run_traced(joined2, "append", "ss_join_left")


if __name__ == "__main__":
    main()
