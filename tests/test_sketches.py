"""Error-bound contracts for the sketch aggregates — the correct 'oracle'
for approximate operators is a pinned tolerance against the exact answer."""

from __future__ import annotations

import pyspark.sql.functions as F

from stockmarket_bigdata_project_spark.catalog import load_table
from stockmarket_bigdata_project_spark.operators.sketches import (
    approx_quantiles_prices,
    datasketches_hll_union,
    hll_distinct_users,
)


def test_approx_quantiles_within_tolerance(spark, sf_dir):
    approx = {
        r.o_orderpriority: (r.p50, r.p90, r.p99)
        for r in approx_quantiles_prices(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: (r.p50, r.p90, r.p99)
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for prio, (a50, a90, a99) in approx.items():
        e50, e90, e99 = exact[prio]
        for a, e in ((a50, e50), (a90, e90), (a99, e99)):
            assert abs(a - e) / e < 0.02, f"{prio}: approx {a} vs exact {e}"


def test_hll_within_rsd(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in hll_distinct_users(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, a in approx.items():
        assert abs(a - exact[et]) / exact[et] < 0.05


def test_sketch_union_matches_global_distinct(spark, sf_dir):
    merged = datasketches_hll_union(spark, sf_dir).collect()[0][0]
    exact = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(merged - exact) / exact < 0.05
