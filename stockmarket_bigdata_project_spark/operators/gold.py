"""Gold-table (medallion) builders — the flagship query.

Reproduces the semantics of the reference's batch gold build
(reference: data_processing/build_training_dataset.py:30-64):

  1. a per-key daily OHLCV re-aggregation of a fact table (A2 in SURVEY §2.4;
     reference groupBy(ticker,date).agg(first(open), max(high), min(low),
     last(close), sum(volume)))
  2. a daily rollup of an activity table (A3; reference reddit_daily)
  3. a LEFT OUTER join of 1⟕2 with null→0 fill (J2/P7; reference
     build_training_dataset.py:62-63) — here joined on date only, the
     deliberate date-fanout semantic of the reference notebooks (J3,
     06_XGBoost_model.ipynb cell 5: subreddit-level features fan out to
     every ticker trading that date)
  4. global orderBy (O1; build_training_dataset.py:64)

Mapped onto testdata: `lineitem` plays the per-(ticker=l_suppkey) price facts,
`orders` plays the daily activity stream.

Determinism note (SURVEY §7.2c): the reference's first()/last() open/close are
order-nondeterministic in Spark. We make them deterministic with
min_by/max_by over a packed TOTAL-order key (see _ord_key: row identity
prefix + price-cents tie-break, because the synthetic testdata does not
keep (orderkey, linenumber) unique); DuckDB's arg_min/arg_max declare the
identical key — this is the engine's documented improvement over the
reference, not a semantic drift. The min_by form keeps
the whole OHLCV build ONE hash aggregate: the earlier window-function form
paid a full shuffle+sort of the fact table before aggregating (measured
2.5s → 1.6s for the flagship at sf0.1; at 100 TB the sort is the bottleneck).

Scale: both aggregations are partial+final hash aggregates (map-side combine);
the daily rollup side is tiny (one row per distinct date) so Catalyst/AQE
broadcasts it — no shuffle of the big fact side for the join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table


def _ord_key() -> F.Column:
    """Deterministic TOTAL-order key for min_by/max_by, packed numeric:
    (l_orderkey·16 + l_linenumber)·10⁸ + price-cents.

    The (orderkey, linenumber) prefix is the row identity in real TPC-H,
    but the synthetic testdata does NOT keep it unique (sf0.1: 457k
    distinct pairs over 600k rows — caught by the sf0.1 oracle sweep when
    a min_by tie let each engine pick a different row's price). The
    price-cents suffix (< 10⁸) makes the order total over everything the
    aggregate can return: ties resolve to the LOWEST price for open
    (min_by) and the HIGHEST for close (max_by) — documented, deterministic
    OHLC semantics. DECIMAL(38,0) carries the packing: at TPC-H sf ≈ 10⁵
    (100 TB) orderkey·16·10⁸ passes 2^63, so BIGINT would overflow; DuckDB
    mirrors with HUGEINT. A string composite key was measured 2× slower;
    the numeric key keeps the aggregate at fixed-width compares."""
    base = (F.col("l_orderkey") * 16 + F.col("l_linenumber")).cast("decimal(38,0)")
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    return base * 100000000 + cents


def supplier_daily_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: deterministic OHLCV re-aggregation per (l_suppkey, ship day) —
    one hash aggregate, open/close via min_by/max_by on the composite key."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_suppkey",
            F.to_date("l_shipdate").alias("trade_date"),
            "l_extendedprice",
            "l_quantity",
            _ord_key().alias("ord_key"),
        )
        .groupBy("l_suppkey", "trade_date")
        .agg(
            F.min_by("l_extendedprice", "ord_key").alias("open_px"),
            F.max("l_extendedprice").alias("high_px"),
            F.min("l_extendedprice").alias("low_px"),
            F.max_by("l_extendedprice", "ord_key").alias("close_px"),
            F.sum("l_quantity").alias("volume"),
        )
    )


def orders_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-shaped daily activity rollup of orders (the 'reddit_daily' analog).

    Money sums are DECIMAL(18,2)-quantized (o_totalprice is 2-decimal by
    construction, so the cast is lossless and the sum exact/associative —
    shuffle merge order can't change the result). The avg is exact-sum ÷
    count in binary64: identical bits on any engine, no round() whose
    boundary behaviour could differ between Spark and DuckDB. Round 1 lost
    this query (and both downstream gold joins) to round(sum(double), 2)
    straddling a half-cent boundary differently per engine.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.withColumn("trade_date", F.to_date("o_orderdate"))
        .groupBy("trade_date")
        .agg(
            F.count("*").alias("order_count"),
            (F.sum(dec).cast("double") / F.count("*")).alias("avg_order_price"),
            F.sum(dec).cast("double").alias("total_order_price"),
            F.max("o_totalprice").alias("max_order_price"),
        )
    )


def gold_daily_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: daily fact agg ⟕ daily activity rollup, fillna(0), ordered.

    reference build_training_dataset.py:62-64 (join + fillna + orderBy) with
    the J3 date-only fanout join of the notebooks.
    """
    stock = supplier_daily_ohlcv(spark, sf_dir)
    activity = orders_daily_rollup(spark, sf_dir)
    return (
        stock.join(F.broadcast(activity), on="trade_date", how="left")
        .na.fill(
            {
                "order_count": 0,
                "avg_order_price": 0.0,
                "total_order_price": 0.0,
                "max_order_price": 0.0,
            }
        )
        .select(
            "l_suppkey",
            "trade_date",
            "open_px",
            "high_px",
            "low_px",
            "close_px",
            "volume",
            "order_count",
            "avg_order_price",
            "total_order_price",
            "max_order_price",
        )
        .orderBy("l_suppkey", "trade_date")
    )


GOLD_ORACLE_SQL = """
WITH base AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS trade_date,
         l_extendedprice, l_quantity,
         CAST(l_orderkey * 16 + l_linenumber AS HUGEINT) * 100000000
           + CAST(round(l_extendedprice * 100) AS BIGINT) AS ord_key
  FROM lineitem
), stock AS (
  SELECT l_suppkey, trade_date,
         arg_min(l_extendedprice, ord_key) AS open_px,
         max(l_extendedprice) AS high_px,
         min(l_extendedprice) AS low_px,
         arg_max(l_extendedprice, ord_key) AS close_px,
         sum(l_quantity) AS volume
  FROM base GROUP BY l_suppkey, trade_date
), activity AS (
  SELECT CAST(o_orderdate AS DATE) AS trade_date,
         count(*) AS order_count,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_price,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_order_price,
         max(o_totalprice) AS max_order_price
  FROM orders GROUP BY 1
)
SELECT s.l_suppkey, s.trade_date, s.open_px, s.high_px, s.low_px, s.close_px,
       s.volume,
       coalesce(a.order_count, 0) AS order_count,
       coalesce(a.avg_order_price, 0.0) AS avg_order_price,
       coalesce(a.total_order_price, 0.0) AS total_order_price,
       coalesce(a.max_order_price, 0.0) AS max_order_price
FROM stock s LEFT JOIN activity a USING (trade_date)
ORDER BY s.l_suppkey, s.trade_date
"""

QUERIES = {
    "gold_daily_features": gold_daily_features,
    "supplier_daily_ohlcv": supplier_daily_ohlcv,
    "orders_daily_rollup": orders_daily_rollup,
}

# Reusable oracle body for the deterministic supplier-daily table; embedded as
# a CTE by the time-series oracle queries.
SUPPLIER_DAILY_SQL = """
WITH base AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS trade_date,
         l_extendedprice, l_quantity,
         CAST(l_orderkey * 16 + l_linenumber AS HUGEINT) * 100000000
           + CAST(round(l_extendedprice * 100) AS BIGINT) AS ord_key
  FROM lineitem
)
SELECT l_suppkey, trade_date,
       arg_min(l_extendedprice, ord_key) AS open_px,
       max(l_extendedprice) AS high_px,
       min(l_extendedprice) AS low_px,
       arg_max(l_extendedprice, ord_key) AS close_px,
       sum(l_quantity) AS volume
FROM base GROUP BY l_suppkey, trade_date
"""

ORACLE = {
    "gold_daily_features": GOLD_ORACLE_SQL,
    "supplier_daily_ohlcv": SUPPLIER_DAILY_SQL,
    "orders_daily_rollup": """
SELECT CAST(o_orderdate AS DATE) AS trade_date,
       count(*) AS order_count,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_order_price,
       max(o_totalprice) AS max_order_price
FROM orders GROUP BY 1
""",
}
