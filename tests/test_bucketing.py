"""The plan property bucketing exists for: a sort-merge join over co-bucketed
scans with ZERO shuffle exchanges anywhere in the plan (values are covered by
the oracle harness)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from stockmarket_bigdata_project_spark.sources.bucketing import (
    bucketed_join_orders_lineitem,
)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    df = bucketed_join_orders_lineitem(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    # the whole point: no hash-partitioning exchange for join OR final agg —
    # both reuse the bucket layout
    assert "Exchange hashpartitioning" not in plan, plan
    assert df.count() > 0
