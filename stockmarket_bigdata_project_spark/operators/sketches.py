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


CMS_D = 4  # count-min depth (independent hash rows)
CMS_W = 256  # count-min width (buckets per row, one md5 hex byte)
CMS_T = 80  # heavy-hitter threshold on the ESTIMATED count


def _cms_bucket(j) -> F.Column:
    """Row-j bucket of a user id: first md5 hex byte of 'j:user_id' —
    deterministic, engine-neutral, uniform over CMS_W=256."""
    h = F.md5(F.concat_ws(":", F.lit(j).cast("string"),
                          F.col("user_id").cast("string")))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters, MATERIALIZED as a real sketch: the
    event stream folds into a CMS_D×CMS_W counter grid (the one-pass,
    mergeable, bounded-memory summary — at 100 TB the grid is still 1024
    integers, mergeable across days by cell-wise addition), then point
    queries estimate each candidate's frequency as min over rows of its
    bucket counter. CMS never undercounts, so `est ≥ exact` always and
    `overcount` is the collision noise — both columns are in the output,
    which is the textbook estimator property made value-checkable.

    Unlike the HLL/KLL queries above (engine-internal sketches → rows-only),
    every hash here is md5-derived, so the ENTIRE sketch — grid, estimates,
    overcounts — is deterministic and value-level oracle-checked.

    Scale shape: grid = one shuffle of (row, bucket) partial counts
    (map-side combine collapses each partition to ≤1024 cells); estimates =
    candidates × CMS_D map-side bucket ids joined against the BROADCAST
    grid. Candidates here are all distinct users (the exact counts verify
    the estimator); production asks the sketch about a small watch-list
    precisely to avoid the exact pass. [extension]"""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    occ = ev.select(
        "user_id",
        F.explode(F.array([F.lit(j) for j in range(CMS_D)])).alias("j"),
    ).select("j", _cms_bucket(F.col("j")).alias("bucket"))
    grid = occ.groupBy("j", "bucket").agg(F.count("*").alias("cnt"))
    cand = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
    )
    cand_cells = cand.select(
        "user_id",
        "exact_n",
        F.explode(F.array([F.lit(j) for j in range(CMS_D)])).alias("j"),
    ).select("user_id", "exact_n", "j", _cms_bucket(F.col("j")).alias("bucket"))
    est = (
        cand_cells.join(F.broadcast(grid), ["j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("est"))
    )
    return est.filter(F.col("est") >= CMS_T).select(
        "user_id",
        "est",
        "exact_n",
        (F.col("est") - F.col("exact_n")).alias("overcount"),
    )


QUERIES["cms_heavy_hitters"] = cms_heavy_hitters


def _cms_bucket_sql(key: str) -> str:
    """DuckDB mirror of _cms_bucket: decode the first md5 hex byte of
    'j:key' with the strpos idiom (no hex-cast dependence)."""
    h = f"md5(CAST(j AS VARCHAR) || ':' || CAST({key} AS VARCHAR))"
    return (
        f"(strpos('0123456789abcdef', substring({h}, 1, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substring({h}, 2, 1)) - 1)"
    )


ORACLE["cms_heavy_hitters"] = f"""
WITH js AS (SELECT unnest(range({CMS_D})) AS j),
occ AS (
  SELECT j, {_cms_bucket_sql("user_id")} AS bucket
  FROM events, js
), grid AS (
  SELECT j, bucket, count(*) AS cnt FROM occ GROUP BY j, bucket
), cand AS (
  SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id
), cells AS (
  SELECT user_id, exact_n, j, {_cms_bucket_sql("user_id")} AS bucket
  FROM cand, js
), est AS (
  SELECT user_id, exact_n, min(cnt) AS est
  FROM cells JOIN grid USING (j, bucket)
  GROUP BY user_id, exact_n
)
SELECT user_id, est, exact_n, est - exact_n AS overcount
FROM est WHERE est >= {CMS_T}
"""
