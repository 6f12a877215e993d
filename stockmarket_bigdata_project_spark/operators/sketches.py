"""Approximate/sketch aggregates (100 TB survival kit, part 2).

At 100 TB, exact distinct counts and exact quantiles are shuffle-heavy
(exact distinct = full shuffle of the key; exact quantile = global sort).
The sketch versions are one-pass, mergeable, and bounded-memory — the only
versions that make sense as default dashboards at scale:

  approx_quantiles_prices   percentile_approx (KLL-style), vs exact oracle
                            at a tolerance pinned by tests/test_sketches.py
  hll_distinct_users        HyperLogLog distinct (approx_count_distinct,
                            relativeSD=0.01) per event_type
  datasketches_hll_union    Apache DataSketches HLL: per-day sketches merged
                            with hll_union_agg — the pattern for incremental
                            rollups (sketch once, merge everywhere) — gated
                            on the function being available in this Spark

Exactness policy: these are rows-only for the driver (approximate by
design); the companion tests assert error bounds against the exact
aggregates, which is the correct contract for sketches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table


def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/p90/p99 of order totals per priority, one pass, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10_000).alias("q")
        )
        .select(
            "o_orderpriority",
            F.round(F.col("q")[0], 2).alias("p50"),
            F.round(F.col("q")[1], 2).alias("p90"),
            F.round(F.col("q")[2], 2).alias("p99"),
        )
    )


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
    )


def datasketches_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch pattern: one HLL sketch per day, unioned to a total —
    how incremental daily jobs produce weekly/monthly distincts without
    re-reading history. Falls back to approx_count_distinct when the
    DataSketches SQL functions aren't in this Spark build."""
    ev = load_table(spark, sf_dir, "events")
    try:
        daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
            F.expr("hll_sketch_agg(user_id)").alias("sk")
        )
        return daily.agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").alias(
                "distinct_users_merged"
            )
        )
    except Exception:  # pragma: no cover - depends on Spark build
        return ev.agg(
            F.approx_count_distinct("user_id").cast("long").alias(
                "distinct_users_merged"
            )
        )


QUERIES = {
    "approx_quantiles_prices": approx_quantiles_prices,
    "hll_distinct_users": hll_distinct_users,
    "datasketches_hll_union": datasketches_hll_union,
}

# Approximate by design → no value-equality oracle; error bounds are pinned
# by tests/test_sketches.py against the exact aggregates.
ORACLE: dict[str, str] = {}
