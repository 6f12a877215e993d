"""Medallion end-to-end feature pipeline (SURVEY §7.0 `features.py`).

The reference's full data path is a three-layer cascade
(reddit_pipeline.py:169-189 → build_training_dataset.py:41-64):

  bronze  raw events (Kafka JSON → rows)
  silver  15-minute windowed features per key    [A1]
  gold    daily rollup of the silver windows joined to the daily fact
          table, null-filled                     [A3 + J2]

This module chains all three as ONE declarative plan, which is the point:
Catalyst sees the whole lineage, pushes the needed columns into the bronze
scan, and fuses the silver→gold reaggregation into two hash-agg stages. The
two-level reaggregation preserves the reference's avg-of-avgs semantics
(daily avg_value = unweighted mean of the 15-min averages — documented
quirk, SURVEY §7.2d).

Scale notes: silver and gold aggregate over the same key prefix
(user_id), so AQE reuses the partitioning; the daily activity side is tiny
and broadcast. The streaming twin of the silver layer is
streaming/pipelines.streaming_window_counts — same window spec, so batch
and stream share semantics by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..functions.exact import dec_sum


def silver_15m_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver: the batch twin of the streaming 15-min windowed agg (A1)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal sums: deterministic under any shuffle-merge order
            (
                dec_sum("value")
                / F.count("value")
            ).alias("avg_value"),
            dec_sum("value").alias(
                "sum_value"
            ),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "user_id",
            "n_events",
            "avg_value",
            "sum_value",
            "max_value",
        )
    )


def medallion_e2e_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold: daily rollup of the silver windows ⟕ customer daily order
    totals, null-filled — the complete reference pipeline in one plan.

    The daily avg-of-avgs carries each window mean as an exact integer
    rational (cents, n) and quantizes at 9dp with pure integer arithmetic —
    double→decimal casts of a genuine-real mean are the op class behind
    r2's one red gate row (playbook rule 2, two_level_rollup)."""
    ev = load_table(spark, sf_dir, "events")
    silver = (
        ev.groupBy(F.window("ts", "15 minutes").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
                "val_cents"
            ),
            F.count("value").alias("n_vals"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "user_id", "n_events", "val_cents", "n_vals", "max_value",
        )
    )
    num = (
        2 * F.col("val_cents") * F.lit(10_000_000).cast("long")
        + F.col("n_vals")
    )
    den = 2 * F.col("n_vals")
    q_nano = ((num - F.pmod(num, den)) / den).cast("long")
    daily_features = (
        silver.withColumn("q_nano", q_nano)
        .groupBy(F.to_date("window_start").alias("day"), "user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            # avg-of-avgs: reference semantics (unweighted), kept + documented
            (
                F.sum("q_nano").cast("double")
                / F.count("q_nano")
                / F.lit(1.0e9)
            ).alias("avg_value"),
            (F.sum("val_cents").cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
            F.max("max_value").alias("max_value"),
        )
    )
    orders_daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            dec_sum("o_totalprice")
            .alias("order_total")
        )
    )
    return (
        daily_features.join(orders_daily, ["user_id", "day"], "left")
        .na.fill({"order_total": 0.0})
        .select(
            "user_id", "day", "n_events", "avg_value", "sum_value",
            "max_value", "order_total",
        )
    )


QUERIES = {
    "silver_15m_features": silver_15m_features,
    "medallion_e2e_daily": medallion_e2e_daily,
}

_SILVER_SQL = """
silver AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start, user_id,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE) / count(value) AS avg_value,
         CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS sum_value,
         max(value) AS max_value
  FROM events GROUP BY 1, 2
)
"""

ORACLE = {
    "silver_15m_features": f"""
WITH {_SILVER_SQL.strip()}
SELECT window_start, user_id, n_events, avg_value, sum_value, max_value
FROM silver
""",
    "medallion_e2e_daily": """
WITH silver_cents AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start, user_id,
         count(*) AS n_events,
         sum(CAST(round(value * 100) AS BIGINT)) AS val_cents,
         count(value) AS n_vals,
         max(value) AS max_value
  FROM events GROUP BY 1, 2
),
q AS (
  SELECT *,
         CAST((num - (num % den)) / den AS BIGINT) AS q_nano
  FROM (
    SELECT *,
           2 * val_cents * 10000000 + n_vals AS num,
           2 * n_vals AS den
    FROM silver_cents
  )
),
daily AS (
  SELECT CAST(window_start AS DATE) AS day, user_id,
         CAST(sum(n_events) AS BIGINT) AS n_events,
         CAST(sum(q_nano) AS DOUBLE) / count(q_nano) / 1000000000.0
           AS avg_value,
         CAST(sum(val_cents) AS DOUBLE) / 100.0 AS sum_value,
         max(max_value) AS max_value
  FROM q GROUP BY 1, 2
),
od AS (
  SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS order_total
  FROM orders GROUP BY 1, 2
)
SELECT d.user_id, d.day, d.n_events, d.avg_value, d.sum_value, d.max_value,
       coalesce(o.order_total, 0.0) AS order_total
FROM daily d LEFT JOIN od o USING (user_id, day)
""",
}
