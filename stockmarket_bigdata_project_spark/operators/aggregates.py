"""Aggregation operators: group-by, multi-level rollups, conditional aggs,
distinct, stats, correlation, cube/rollup/pivot extensions.

Covers SURVEY §2.4 (A1-A10) plus the [extension] grouping operators. All are
built-in hash aggregates — partial (map-side combine) + final — so the shuffle
moves pre-aggregated partials, which is the property that survives 100 TB.

Reference parity cites (into /root/reference):
  A2  OHLCV re-agg            build_training_dataset.py:30-36 (operators/gold.py)
  A3  two-level rollup        build_training_dataset.py:50-56
  A4  conditional ratios      Untitled1.ipynb cell 7; stock_pipeline.py:186-200
  A5  distinct                stock_pipeline.py:286
  A6  global count            spark_consumer.py:86
  A7  group sizes             download_finance_stooq.py:103
  A8  describe/summary        01_preprocess.ipynb cell 3
  A9  correlation matrix      app.py:366-368
  A10 scaler fit stats        01_..ipynb cell 6 (→ ml.py for the transform)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table


# --- A6: global counts -------------------------------------------------------
def global_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.count_distinct("l_suppkey").alias("n_suppliers"),
    )


# --- A7: group sizes ---------------------------------------------------------
def group_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(F.count("*").alias("n"))


# --- A5: distinct ------------------------------------------------------------
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_type").distinct()


# --- A3: two-level (partial→final) re-aggregation across granularities ------
def two_level_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15m-window aggregates re-aggregated to daily (avg-of-avgs preserved
    deliberately — the reference's unweighted semantics, SURVEY §7.2d)."""
    ev = load_table(spark, sf_dir, "events")
    win15 = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            (F.floor((F.unix_timestamp("ts") % 86400) / 900)).alias("slot"),
            "event_type",
        )
        .agg(F.count("*").alias("post_count"), F.avg("value").alias("avg_value"))
    )
    return (
        win15.groupBy("day", "event_type")
        .agg(
            F.sum("post_count").alias("total_posts"),
            F.round(F.avg("avg_value"), 6).alias("avg_of_avg_value"),
            F.max("post_count").alias("max_slot_posts"),
        )
    )


# --- A4: conditional aggregates (ratio lambdas → conditional aggs) ----------
def conditional_agg_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev("value"), 6).alias("std_value"),
        F.round(
            F.avg((F.col("value") > 100.0).cast("int")), 6
        ).alias("hi_ratio"),
        F.round(
            F.avg((F.col("value") <= 100.0).cast("int")), 6
        ).alias("lo_ratio"),
    )


# --- A8: summary stats (describe, made explicit) ----------------------------
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("l_quantity").alias("cnt"),
        F.round(F.avg("l_quantity"), 6).alias("mean_qty"),
        F.round(F.stddev("l_quantity"), 6).alias("std_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.percentile("l_quantity", 0.5), 6).alias("median_qty"),
    )


# --- A9: correlation ---------------------------------------------------------
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("corr_price_disc"),
    )


# --- TPC-H Q1 shape: the canonical multi-agg group-by -----------------------
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — the canonical OLAP hash-agg:
    scan-filter → 8 aggregates × small group cardinality. Map-side partials
    reduce 100 TB of scan to KBs of shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- [extension] cube / rollup ----------------------------------------------
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form cube/rollup specialize):
    revenue by (priority, status), by priority alone, and the grand total —
    but NOT by status alone, which neither cube nor rollup can express.
    One pass over orders; Catalyst expands to a single Expand + hash agg."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
        """
    )


# --- [extension] pivot -------------------------------------------------------
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on a known value list (keeps the plan static — required at scale;
    a value-discovering pivot needs an extra pass)."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.round(F.sum("value"), 2))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0.0)).alias(f"{k}_value") for k in kinds]
    )


# --- [extension] distinct + approx distinct ---------------------------------
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )


def approx_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct — the scale path (no exact distinct shuffle).
    Not oracle-checked (approximation differs per implementation)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )


QUERIES = {
    "global_counts": global_counts,
    "group_sizes": group_sizes,
    "distinct_event_types": distinct_event_types,
    "two_level_rollup": two_level_rollup,
    "conditional_agg_ratios": conditional_agg_ratios,
    "summary_stats": summary_stats,
    "correlation_matrix": correlation_matrix,
    "pricing_summary": pricing_summary,
    "cube_returnflag_status": cube_returnflag_status,
    "rollup_priority_status": rollup_priority_status,
    "grouping_sets_revenue": grouping_sets_revenue,
    "pivot_event_values": pivot_event_values,
    "count_distinct_users": count_distinct_users,
    "approx_count_distinct_users": approx_count_distinct_users,
}

ORACLE = {
    "global_counts": """
SELECT count(*) AS n_rows,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
""",
    "group_sizes": "SELECT user_id, count(*) AS n FROM events GROUP BY user_id",
    "distinct_event_types": "SELECT DISTINCT event_type FROM events",
    "two_level_rollup": """
WITH win15 AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(floor((epoch(ts) % 86400) / 900) AS BIGINT) AS slot,
         event_type,
         count(*) AS post_count,
         avg(value) AS avg_value
  FROM events GROUP BY 1, 2, 3
)
SELECT day, event_type,
       sum(post_count) AS total_posts,
       round(avg(avg_value), 6) AS avg_of_avg_value,
       max(post_count) AS max_slot_posts
FROM win15 GROUP BY day, event_type
""",
    "conditional_agg_ratios": """
SELECT event_type, count(*) AS n,
       round(avg(value), 6) AS mean_value,
       round(stddev_samp(value), 6) AS std_value,
       round(avg(CASE WHEN value > 100.0 THEN 1 ELSE 0 END), 6) AS hi_ratio,
       round(avg(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END), 6) AS lo_ratio
FROM events GROUP BY event_type
""",
    "summary_stats": """
SELECT count(l_quantity) AS cnt,
       round(avg(l_quantity), 6) AS mean_qty,
       round(stddev_samp(l_quantity), 6) AS std_qty,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty
FROM lineitem
""",
    "correlation_matrix": """
SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
       round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc
FROM lineitem
""",
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "grouping_sets_revenue": """
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
""",
    "cube_returnflag_status": """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "rollup_priority_status": """
SELECT o_orderpriority, o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
    "pivot_event_values": """
SELECT user_id,
       coalesce(round(sum(value) FILTER (WHERE event_type = 'click'), 2), 0.0) AS click_value,
       coalesce(round(sum(value) FILTER (WHERE event_type = 'view'), 2), 0.0) AS view_value,
       coalesce(round(sum(value) FILTER (WHERE event_type = 'purchase'), 2), 0.0) AS purchase_value,
       coalesce(round(sum(value) FILTER (WHERE event_type = 'signup'), 2), 0.0) AS signup_value,
       coalesce(round(sum(value) FILTER (WHERE event_type = 'error'), 2), 0.0) AS error_value
FROM events GROUP BY user_id
""",
    "count_distinct_users": """
SELECT event_type, count(DISTINCT user_id) AS exact_users
FROM events GROUP BY event_type
""",
}
