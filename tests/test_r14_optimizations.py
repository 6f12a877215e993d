"""Round-14 optimization pins.

Each optimization that changed an operator's internals gets a focused test:
  * the conditional scan fan-out (catalog._maybe_fanout) — fires exactly for
    sub-split files above the dimension floor, never at production split
    sizes, and is env-disableable;
  * the single-pass window forms of duplicate_spans and the winnowing df cap
    — the gram/fingerprint pipeline must appear ONCE in the plan (the former
    aggregate + join-back shape carried it once per join side).
"""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from stockmarket_bigdata_project_spark import catalog
from tests.conftest import SF_DIR


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _op_count(plan: str, op: str) -> int:
    # operator-list entries look like "+- Generate (9)"; details repeat the
    # name as "(9) Generate" — count only the operator-list form
    import re

    return len(re.findall(rf"\b{op} \(\d+\)", plan))


# --- scan fan-out -----------------------------------------------------------


def test_size_conf_bytes_parses_spark_size_strings():
    f = catalog._size_conf_bytes
    assert f("134217728") == 134217728
    assert f("128m") == 128 * 1024 * 1024
    assert f("128MB") == 128 * 1024 * 1024
    assert f("1g") == 1024**3
    assert f("64k") == 64 * 1024
    assert f("garbage", default=7) == 7


def test_fanout_fires_only_between_floor_and_split(spark, tmp_path):
    """Floor ≤ size < one split → RoundRobin repartition; outside → no-op."""
    sf01 = "/root/testdata/sf0.1"
    # supplier at sf0.1 is ~22 KiB (dimension floor) -> no fan-out
    small = catalog.load_table(spark, sf01, "supplier")
    assert "RoundRobinPartitioning" not in _formatted_plan(small)
    # lineitem at sf0.1 is ~10 MiB (sub-split fact) -> fan-out fires
    big = catalog.load_table(spark, sf01, "lineitem")
    plan = _formatted_plan(big)
    assert "RoundRobinPartitioning" in plan
    # ... to the cluster's parallelism
    assert f"RoundRobinPartitioning({spark.sparkContext.defaultParallelism})" in plan


def test_fanout_is_a_noop_at_production_split_sizes(spark, monkeypatch):
    """A file at least one split wide must NOT be repartitioned — the scan
    parallelizes itself at scale; this pins the no-op branch the 100 TB
    deployment rides."""
    path = catalog.table_path("/root/testdata/sf0.1", "lineitem")
    real_getsize = os.path.getsize
    monkeypatch.setattr(
        os.path,
        "getsize",
        lambda p: 200 * 1024 * 1024 if p == path else real_getsize(p),
    )
    df = catalog.load_table(spark, "/root/testdata/sf0.1", "lineitem")
    assert "RoundRobinPartitioning" not in _formatted_plan(df)


def test_fanout_env_kill_switch(spark, monkeypatch):
    monkeypatch.setattr(catalog, "_FANOUT_DISABLED", True)
    df = catalog.load_table(spark, "/root/testdata/sf0.1", "lineitem")
    assert "RoundRobinPartitioning" not in _formatted_plan(df)


def test_fanout_preserves_scan_pushdown(spark):
    """Filters and pruning must still reach the parquet scan below the
    fan-out exchange (guide §6: PushedFilters / ReadSchema)."""
    df = (
        catalog.load_table(spark, "/root/testdata/sf0.1", "lineitem")
        .filter(F.col("l_suppkey") == 7)
        .select("l_suppkey", "l_quantity")
    )
    plan = _formatted_plan(df)
    assert "PushedFilters: [IsNotNull(l_suppkey), EqualTo(l_suppkey,7)]" in plan
    assert "l_extendedprice" not in plan  # pruned at the scan


# --- single-pass window forms ----------------------------------------------


def test_duplicate_spans_single_gram_pass(spark):
    """The positional gram explode must appear ONCE (window count), not once
    per side of an aggregate + join-back (the pre-r14 shape had 2)."""
    from stockmarket_bigdata_project_spark.llmdata.dedup import duplicate_spans

    plan = _formatted_plan(duplicate_spans(spark, SF_DIR))
    assert _op_count(plan, "Generate") == 1
    assert _op_count(plan, "Window") >= 1


def test_winnowing_candidates_two_fingerprint_passes(spark):
    """winnowing_dup_candidates: the fingerprint pipeline feeds the df-cap
    window ONCE and the self-join references that same capped relation on
    both sides (2 Generate total — one per self-join side; the pre-r14
    agg+join-back shape carried a third for the df count)."""
    from stockmarket_bigdata_project_spark.llmdata.textstats import (
        winnowing_dup_candidates,
    )

    plan = _formatted_plan(winnowing_dup_candidates(spark, SF_DIR))
    assert _op_count(plan, "Generate") == 2
    assert _op_count(plan, "Window") >= 1
