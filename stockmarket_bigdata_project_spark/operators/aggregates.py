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
from ..functions.exact import big_sum, sql_big_sum


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
    deliberately — the reference's unweighted semantics, SURVEY §7.2d).

    Determinism: every output column is BIGINT (or the grouping key). The
    slot mean is carried as an exact integer rational (cents, n) quantized
    at 9dp by pure integer arithmetic:
        q_nano = round_half_up(cents·10^7 / n) = (2·cents·10^7 + n) div (2·n)
    (all operands positive, so Spark's truncating DIV == DuckDB's flooring
    // — and int64 division is exact at any magnitude, unlike the previous
    binary64 route which caps at 2^53). The daily level emits the exact
    pair (sum_q_nano, n_slots) instead of their quotient: after two red
    rounds of quantized-double variants (r2: decimal cast, r3: the oracle's
    sum(int) → HUGEINT dtype leak), no non-integer column remains — a hash
    over BIGINTs cannot drift in any environment. Consumers derive
    avg_of_avg_value = sum_q_nano / n_slots / 1e9."""
    ev = load_table(spark, sf_dir, "events")
    win15 = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            (F.floor((F.unix_timestamp("ts") % 86400) / 900)).alias("slot"),
            "event_type",
        )
        .agg(
            F.count("*").alias("post_count"),
            # exact integer cents (value is 2-decimal; same idiom as
            # correlation_matrix, hash-proven r1)
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
                "val_cents"
            ),
            F.count("value").alias("n_vals"),
        )
    )
    q = win15.withColumns(
        {
            "num": 2 * F.col("val_cents") * F.lit(10_000_000).cast("long")
            + F.col("n_vals"),
            "den": 2 * F.col("n_vals"),
        }
    ).withColumn("q_nano", F.expr("num DIV den"))
    return q.groupBy("day", "event_type").agg(
        F.sum("post_count").alias("total_posts"),
        F.sum("q_nano").alias("sum_q_nano"),
        F.count("q_nano").alias("n_slots"),
        F.max("post_count").alias("max_slot_posts"),
    )


# --- A4: conditional aggregates (ratio lambdas → conditional aggs) ----------
def conditional_agg_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # stddev via exact decimal sums (value and value^2 quantized) + pure
    # binary64 algebra: Spark's stddev merges partial moments in shuffle
    # order, so its low bits are not even run-to-run stable. sqrt((S2 -
    # S1^2/n)/(n-1)) from exact S1,S2 is bit-identical on both engines.
    s1 = F.sum(F.col("value").cast("decimal(27,2)")).cast("double")
    s2 = F.sum((F.col("value") * F.col("value")).cast("decimal(27,4)")).cast(
        "double"
    )
    nv = F.count("value")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (s1 / nv).alias("mean_value"),
        F.sqrt(
            (s2 - s1 * s1 / nv) / F.nullif((nv - 1).cast("double"), F.lit(0.0))
        ).alias("std_value"),
        F.avg((F.col("value") > 100.0).cast("int")).alias("hi_ratio"),
        F.avg((F.col("value") <= 100.0).cast("int")).alias("lo_ratio"),
    )


# --- A8: summary stats (describe, made explicit) ----------------------------
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # l_quantity is integer-valued, so plain double sums of qty and qty^2 are
    # exact below 2^53 in any accumulation order; the stddev is then pure
    # binary64 algebra (Spark's stddev merges partial moments in shuffle
    # order — not even run-to-run stable in the low bits).
    s1 = F.sum("l_quantity")
    s2 = F.sum(F.col("l_quantity") * F.col("l_quantity"))
    n = F.count("l_quantity")
    return li.agg(
        F.count("l_quantity").alias("cnt"),
        (s1 / n).alias("mean_qty"),
        F.sqrt(
            (s2 - s1 * s1 / n) / F.nullif((n - 1).cast("double"), F.lit(0.0))
        ).alias("std_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
    )


# --- A9: correlation ---------------------------------------------------------
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr from exact power sums (see summary_stats: built-in corr merges
    partial co-moments in shuffle order). Correlation is scale-invariant, so
    the variables go to INTEGER cents first and every sum runs through
    big_sum's decimal-string route: at sf0.1 the squared-price sums exceed
    2^53 in raw scaled units, where a plain DECIMAL(27,4)→double cast is
    1-ulp-off between engines (DuckDB divides the int128 raw value; caught
    by the sf0.1 oracle sweep, round 2)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("p"),
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("d"),
    )

    def _corr(x: str, y: str) -> F.Column:
        n = F.count("*")  # columns are non-null in lineitem
        sx = big_sum(F.col(x))
        sy = big_sum(F.col(y))
        sxy = big_sum(F.col(x) * F.col(y))
        sxx = big_sum(F.col(x) * F.col(x))
        syy = big_sum(F.col(y) * F.col(y))
        return (n * sxy - sx * sy) / F.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    return base.agg(
        _corr("q", "p").alias("corr_qty_price"),
        _corr("q", "d").alias("corr_qty_disc"),
        _corr("p", "d").alias("corr_price_disc"),
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
            # qty is integer-valued: plain double sum is exact in any order.
            # Money exprs are 2/4/6-decimal by construction: quantized decimal
            # sums are lossless, associative, and cast back to one double.
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ).cast("decimal(27,6)")
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).cast(
                    "double"
                )
                / F.count("l_extendedprice")
            ).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(27,2)")).cast("double")
                / F.count("l_discount")
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- [extension] cube / rollup ----------------------------------------------
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty")
    )


def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
        .cast("double")
        .alias("total"),
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
               CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total
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
        .agg(F.sum(F.col("value").cast("decimal(27,2)")).cast("double"))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0.0)).alias(f"{k}_value") for k in kinds]
    )


# --- [extension] unpivot (melt) — the inverse of pivot -----------------------
def unpivot_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide OHLC → long (supplier, date, field, px) via ``unpivot``: the
    long form feeds per-field pipelines (normalization, plotting, feature
    stores) without four separate scans. Expands rows 4x map-side — no
    shuffle beyond the OHLCV build itself."""
    from .gold import supplier_daily_ohlcv

    s = supplier_daily_ohlcv(spark, sf_dir)
    return s.unpivot(
        ["l_suppkey", "trade_date"],
        ["open_px", "high_px", "low_px", "close_px"],
        "field",
        "px",
    )


# --- [extension] numeric-bin histogram ---------------------------------------
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value (bin = floor(price/20k)): the
    one-pass distributed histogram every profiler needs — bin id computed
    map-side, ONE shuffle of (bin, partial count). floor of a 2-dec double
    over an exact power-of-two-free divisor is engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / 20000.0)
    return (
        o.groupBy(b.cast("int").alias("bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("bin_value"),
        )
    )


# --- [extension] exact higher moments (skewness / kurtosis) ------------------
def value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of events.value per event_type from
    EXACT power sums: S1..S4 of integer cents accumulate in DECIMAL(38,0)
    (associative — any shuffle order), then one shared run of binary64
    algebra. The built-ins (skewness/kurtosis) merge partial moments in
    shuffle order and are not even run-to-run stable — same reason the
    playbook bans stddev/corr built-ins. Skew/kurt are scale-invariant, so
    the cents scaling cancels and only mean/std get the /100.
    m2^1.5 is m2*sqrt(m2): sqrt is IEEE correctly-rounded in both engines,
    pow() is not. Headroom: cents^4·rows ~ 1e31 at 1e12 rows — fits 38
    digits."""
    ev = load_table(spark, sf_dir, "events")
    c = F.expr("CAST(round(value * 100) AS DECIMAL(12,0))")
    # int→double via a decimal STRING: DuckDB's int128→double conversion is
    # not correctly rounded (observed 1-ulp-truncated s4 above 2^53), but
    # BOTH engines parse digit strings with correct rounding — so the one
    # inexact step of the whole pipeline happens identically. Costs nothing:
    # five group rows.
    def exact_dbl(col):
        return F.sum(col).cast("string").cast("double")

    sums = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        exact_dbl(c).alias("s1"),
        exact_dbl(c * c).alias("s2"),
        exact_dbl(c * c * c).alias("s3"),
        exact_dbl(c * c * c * c).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - F.lit(3.0) * mu * (F.col("s2") / F.col("n")) + F.lit(2.0) * mu * mu * mu
    m4 = (
        F.col("s4") / F.col("n")
        - F.lit(4.0) * mu * (F.col("s3") / F.col("n"))
        + F.lit(6.0) * mu * mu * (F.col("s2") / F.col("n"))
        - F.lit(3.0) * mu * mu * mu * mu
    )
    return sums.select(
        "event_type",
        "n",
        (mu / 100.0).alias("mean_value"),
        (F.sqrt(m2) / 100.0).alias("std_value"),
        (m3 / (m2 * F.sqrt(m2))).alias("skewness"),
        (m4 / (m2 * m2) - 3.0).alias("kurtosis"),
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
    "unpivot_ohlc": unpivot_ohlc,
    "order_price_histogram": order_price_histogram,
    "value_moments": value_moments,
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

from .gold import SUPPLIER_DAILY_SQL  # noqa: E402  (oracle twin of unpivot_ohlc)

ORACLE = {
    "unpivot_ohlc": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL})
SELECT l_suppkey, trade_date, 'open_px'  AS field, open_px  AS px FROM stock
UNION ALL
SELECT l_suppkey, trade_date, 'high_px'  AS field, high_px  AS px FROM stock
UNION ALL
SELECT l_suppkey, trade_date, 'low_px'   AS field, low_px   AS px FROM stock
UNION ALL
SELECT l_suppkey, trade_date, 'close_px' AS field, close_px AS px FROM stock
""",
    "order_price_histogram": """
SELECT CAST(floor(o_totalprice / 20000.0) AS INTEGER) AS bin,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS bin_value
FROM orders GROUP BY 1
""",
    "value_moments": """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS HUGEINT) AS c FROM events
),
sums AS (
  SELECT event_type, count(*) AS n,
         CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(sum(c*c) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(sum(c*c*c) AS VARCHAR) AS DOUBLE) AS s3,
         CAST(CAST(sum(c*c*c*c) AS VARCHAR) AS DOUBLE) AS s4
  FROM c GROUP BY event_type
),
m AS (
  SELECT event_type, n, s1 / n AS mu, s2, s3, s4 FROM sums
),
cm AS (
  SELECT event_type, n, mu,
         s2 / n - mu * mu AS m2,
         s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu AS m3,
         s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n)
                - 3.0 * mu * mu * mu * mu AS m4
  FROM m
)
SELECT event_type, n,
       mu / 100.0 AS mean_value,
       sqrt(m2) / 100.0 AS std_value,
       m3 / (m2 * sqrt(m2)) AS skewness,
       m4 / (m2 * m2) - 3.0 AS kurtosis
FROM cm
""",
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
         sum(CAST(round(value * 100) AS BIGINT)) AS val_cents,
         count(value) AS n_vals
  FROM events GROUP BY 1, 2, 3
), q AS (
  SELECT day, event_type, post_count,
         CAST((2 * val_cents * 10000000 + n_vals) // (2 * n_vals) AS BIGINT)
           AS q_nano
  FROM win15
)
SELECT day, event_type,
       CAST(sum(post_count) AS BIGINT) AS total_posts,
       CAST(sum(q_nano) AS BIGINT) AS sum_q_nano,
       count(q_nano) AS n_slots,
       max(post_count) AS max_slot_posts
FROM q GROUP BY day, event_type
""",
    "conditional_agg_ratios": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE) / count(value) AS mean_value,
       sqrt((CAST(sum(CAST(value * value AS DECIMAL(27,4))) AS DOUBLE)
             - CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE)
               * CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE) / count(value))
            / NULLIF(CAST(count(value) - 1 AS DOUBLE), 0.0)) AS std_value,
       avg(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS hi_ratio,
       avg(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) AS lo_ratio
FROM events GROUP BY event_type
""",
    "summary_stats": """
SELECT count(l_quantity) AS cnt,
       sum(l_quantity) / count(l_quantity) AS mean_qty,
       sqrt((sum(l_quantity * l_quantity)
             - sum(l_quantity) * sum(l_quantity) / count(l_quantity))
            / NULLIF(CAST(count(l_quantity) - 1 AS DOUBLE), 0.0)) AS std_qty,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty,
       quantile_cont(l_quantity, 0.5) AS median_qty
FROM lineitem
""",
    "correlation_matrix": f"""
WITH b AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
         CAST(round(l_discount * 100) AS BIGINT) AS d
  FROM lineitem
)
SELECT (count(*) * {sql_big_sum("q * p")} - {sql_big_sum("q")} * {sql_big_sum("p")})
         / sqrt((count(*) * {sql_big_sum("q * q")} - {sql_big_sum("q")} * {sql_big_sum("q")})
                * (count(*) * {sql_big_sum("p * p")} - {sql_big_sum("p")} * {sql_big_sum("p")})) AS corr_qty_price,
       (count(*) * {sql_big_sum("q * d")} - {sql_big_sum("q")} * {sql_big_sum("d")})
         / sqrt((count(*) * {sql_big_sum("q * q")} - {sql_big_sum("q")} * {sql_big_sum("q")})
                * (count(*) * {sql_big_sum("d * d")} - {sql_big_sum("d")} * {sql_big_sum("d")})) AS corr_qty_disc,
       (count(*) * {sql_big_sum("p * d")} - {sql_big_sum("p")} * {sql_big_sum("d")})
         / sqrt((count(*) * {sql_big_sum("p * p")} - {sql_big_sum("p")} * {sql_big_sum("p")})
                * (count(*) * {sql_big_sum("d * d")} - {sql_big_sum("d")} * {sql_big_sum("d")})) AS corr_price_disc
FROM b
""",
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
       sum(l_quantity) / count(l_quantity) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(27,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "grouping_sets_revenue": """
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
""",
    "cube_returnflag_status": """
SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "rollup_priority_status": """
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
    "pivot_event_values": """
SELECT user_id,
       coalesce(CAST(sum(CAST(value AS DECIMAL(27,2))) FILTER (WHERE event_type = 'click') AS DOUBLE), 0.0) AS click_value,
       coalesce(CAST(sum(CAST(value AS DECIMAL(27,2))) FILTER (WHERE event_type = 'view') AS DOUBLE), 0.0) AS view_value,
       coalesce(CAST(sum(CAST(value AS DECIMAL(27,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE), 0.0) AS purchase_value,
       coalesce(CAST(sum(CAST(value AS DECIMAL(27,2))) FILTER (WHERE event_type = 'signup') AS DOUBLE), 0.0) AS signup_value,
       coalesce(CAST(sum(CAST(value AS DECIMAL(27,2))) FILTER (WHERE event_type = 'error') AS DOUBLE), 0.0) AS error_value
FROM events GROUP BY user_id
""",
    "count_distinct_users": """
SELECT event_type, count(DISTINCT user_id) AS exact_users
FROM events GROUP BY event_type
""",
}


MV_CUTOFF = "2001-01-01"  # base/delta split: the materialized past vs CDC


def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance by PARTIAL-AGGREGATE MERGE — the
    incremental pattern every 100 TB rollup runs on: the historical base
    (orders before MV_CUTOFF) is aggregated once and would live as a
    table; each refresh aggregates ONLY the delta slice and merges the
    K-row partials (counts and exact cents sums add; the average is
    re-derived from merged partials, never averaged-across-averages). The
    oracle recomputes the aggregate over ALL rows directly, so the gate
    verifies merged == recomputed value-for-value — the correctness
    contract of incremental maintenance.

    Scale shape: the delta aggregate shuffles only delta rows; the merge
    is a K-row full-outer join; both cutoff filters are static literals,
    pushed into the parquet scans. [extension]"""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderdate",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )

    def slice_agg(pred):
        return (
            o.filter(pred)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("cents").alias("sc"))
        )

    base = slice_agg(F.col("o_orderdate") < MV_CUTOFF)
    delta = slice_agg(F.col("o_orderdate") >= MV_CUTOFF)
    b = base.select(
        "o_orderpriority", F.col("n").alias("bn"), F.col("sc").alias("bs")
    )
    d = delta.select(
        "o_orderpriority", F.col("n").alias("dn"), F.col("sc").alias("ds")
    )
    merged = b.join(d, "o_orderpriority", "full_outer").select(
        "o_orderpriority",
        (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        (F.coalesce("bs", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("sc"),
    )
    avg_micro = F.expr("(2 * sc * 10000 + n) div (2 * n)")
    return merged.select(
        F.col("o_orderpriority"),
        F.col("n").alias("n_orders"),
        (F.col("sc") / 100.0).alias("revenue"),
        (avg_micro / F.lit(1_000_000.0)).alias("avg_price"),
    )


QUERIES["incremental_agg_maintenance"] = incremental_agg_maintenance

ORACLE["incremental_agg_maintenance"] = """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         / 100.0 AS revenue,
       ((2 * CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         * 10000 + count(*)) // (2 * count(*))) / 1000000.0 AS avg_price
FROM orders
GROUP BY o_orderpriority
"""
