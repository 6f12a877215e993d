"""Financial time-series analytics (domain extension pack).

The reference predicts prices but never computes the standard quant
diagnostics its dashboard hints at (correlation matrix, app.py:360-368, is
the closest). This pack ships them as first-class window queries — the ops a
stock-market engine is actually asked for — every one a single
`Window.partitionBy(key).orderBy(date)` pass, fully DuckDB-oracle-checked:

  vwap_daily          volume-weighted avg price per (supplier, day)
  twap_hourly         time-weighted avg price (equal-weight per observation)
  rolling_volatility  trailing 5-day stddev of daily returns
  rolling_beta        trailing 10-day beta vs the market-average return,
                      built from window avgs (identical formula both engines)
  max_drawdown        running-peak drawdown + per-supplier max
  cumulative_return   compounded return via exp(sum(log1p(r))) - 1

Scale notes: all queries share the (l_suppkey, trade_date) partitioning of
supplier_daily_ohlcv — one exchange feeds every chained window; frames are
row-bounded (constant state per row).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from .gold import SUPPLIER_DAILY_SQL, supplier_daily_ohlcv


def _returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("trade_date")
    return s.withColumn(
        "ret", F.col("close_px") / F.lag("close_px", 1).over(w) - 1
    )


_RETURNS_SQL = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
rets AS (
  SELECT l_suppkey, trade_date, close_px,
         close_px / lag(close_px, 1) OVER (PARTITION BY l_suppkey
                                           ORDER BY trade_date) - 1 AS ret
  FROM stock
)
"""


def vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VWAP per (supplier, day): sum(price*qty)/sum(qty) — one hash agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_suppkey",
            F.to_date("l_shipdate").alias("trade_date"),
            "l_extendedprice",
            "l_quantity",
        )
        .groupBy("l_suppkey", "trade_date")
        .agg(
            # price*qty is 2-decimal (2-dec × integer): the DECIMAL(27,2) sum
            # is exact in any merge order; qty sums are integer-exact. The
            # quotient is then one deterministic binary64 division.
            (
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                        "decimal(27,2)"
                    )
                ).cast("double")
                / F.sum("l_quantity")
            ).alias("vwap"),
            F.sum("l_quantity").alias("total_qty"),
        )
    )


def twap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP buckets over the events stream: equal-weight mean of `value` per
    (user, hour) — the observation-weighted twin of vwap_daily."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(27,2)")).cast("double")
                / F.count("value")
            ).alias("twap"),
            F.count("*").alias("n_obs"),
        )
    )


def rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-day sample stddev of daily returns (annualization is a
    constant factor, left to the caller)."""
    r = _returns(spark, sf_dir)
    w5 = (
        Window.partitionBy("l_suppkey").orderBy("trade_date").rowsBetween(-4, 0)
    )
    return r.select(
        "l_suppkey",
        "trade_date",
        F.round(F.stddev("ret").over(w5), 6).alias("vol_5d"),
    )


def rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 10-day beta vs the market: cov(x,m)/var(m) expressed through
    window AVGs so Spark and DuckDB accumulate identically:
    beta = (avg(xm) - avg(x)avg(m)) / (avg(m²) - avg(m)²)."""
    r = _returns(spark, sf_dir)
    # unordered avg of inexact doubles is not run-to-run stable: quantize
    # the (deterministic, per-row) return at 14dp so the sum is exact
    market = r.groupBy("trade_date").agg(
        (
            F.sum(F.col("ret").cast("decimal(27,14)")).cast("double")
            / F.count("ret")
        ).alias("mret")
    )
    j = r.join(market, "trade_date").filter(
        F.col("ret").isNotNull() & F.col("mret").isNotNull()
    )
    w10 = (
        Window.partitionBy("l_suppkey").orderBy("trade_date").rowsBetween(-9, 0)
    )
    cov = F.avg(F.col("ret") * F.col("mret")).over(w10) - F.avg("ret").over(
        w10
    ) * F.avg("mret").over(w10)
    var = F.avg(F.col("mret") * F.col("mret")).over(w10) - F.avg("mret").over(
        w10
    ) * F.avg("mret").over(w10)
    # var(m)=0 on the first window row → NULL beta (try_divide / NULLIF)
    return j.select(
        "l_suppkey",
        "trade_date",
        F.round(F.try_divide(cov, F.nullif(var, F.lit(0.0))), 6).alias("beta_10d"),
    )


def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown per supplier + the max drawdown to date."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("trade_date").rowsBetween(
        Window.unboundedPreceding, 0
    )
    peak = F.max("close_px").over(w)
    # two steps: window functions can't nest (same restriction in DuckDB)
    with_dd = s.withColumn("dd", (F.col("close_px") - peak) / peak)
    return with_dd.select(
        "l_suppkey",
        "trade_date",
        F.round("dd", 6).alias("drawdown"),
        F.round(F.min("dd").over(w), 6).alias("max_drawdown_to_date"),
    )


def cumulative_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compounded return since inception: exp(sum(ln(1+r))) - 1 — the
    shuffle-free way to express a cumulative product."""
    r = _returns(spark, sf_dir).filter(F.col("ret").isNotNull())
    w = Window.partitionBy("l_suppkey").orderBy("trade_date").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return r.select(
        "l_suppkey",
        "trade_date",
        F.round(F.exp(F.sum(F.log1p("ret")).over(w)) - 1, 6).alias("cum_return"),
    )


QUERIES = {
    "vwap_daily": vwap_daily,
    "twap_hourly": twap_hourly,
    "rolling_volatility": rolling_volatility,
    "rolling_beta": rolling_beta,
    "max_drawdown": max_drawdown,
    "cumulative_return": cumulative_return,
}

ORACLE = {
    "vwap_daily": """
SELECT l_suppkey, CAST(l_shipdate AS DATE) AS trade_date,
       CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(27,2))) AS DOUBLE)
         / sum(l_quantity) AS vwap,
       sum(l_quantity) AS total_qty
FROM lineitem GROUP BY 1, 2
""",
    "twap_hourly": """
SELECT user_id, date_trunc('hour', ts) AS hour,
       CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE) / count(value) AS twap,
       count(*) AS n_obs
FROM events GROUP BY 1, 2
""",
    "rolling_volatility": _RETURNS_SQL
    + """
SELECT l_suppkey, trade_date,
       round(stddev_samp(ret) OVER (PARTITION BY l_suppkey ORDER BY trade_date
                                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             6) AS vol_5d
FROM rets
""",
    "rolling_beta": _RETURNS_SQL
    + """,
market AS (
  SELECT trade_date,
         CAST(sum(CAST(ret AS DECIMAL(27,14))) AS DOUBLE) / count(ret) AS mret
  FROM rets GROUP BY trade_date
),
j AS (
  SELECT r.l_suppkey, r.trade_date, r.ret, m.mret
  FROM rets r JOIN market m USING (trade_date)
  WHERE r.ret IS NOT NULL AND m.mret IS NOT NULL
)
SELECT l_suppkey, trade_date,
       round((avg(ret * mret) OVER w - avg(ret) OVER w * avg(mret) OVER w)
             / NULLIF(avg(mret * mret) OVER w
                      - avg(mret) OVER w * avg(mret) OVER w, 0.0),
             6) + 0.0 AS beta_10d
FROM j
WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
""",
    "max_drawdown": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
dd AS (
  SELECT l_suppkey, trade_date,
         (close_px - max(close_px) OVER w) / max(close_px) OVER w AS dd
  FROM stock
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT l_suppkey, trade_date, round(dd, 6) + 0.0 AS drawdown,
       round(min(dd) OVER (PARTITION BY l_suppkey ORDER BY trade_date
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) + 0.0 AS max_drawdown_to_date
FROM dd
""",
    "cumulative_return": _RETURNS_SQL
    + """
SELECT l_suppkey, trade_date,
       round(exp(sum(ln(1 + ret)) OVER (PARTITION BY l_suppkey
                                        ORDER BY trade_date
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW)) - 1, 6) + 0.0 AS cum_return
FROM rets
WHERE ret IS NOT NULL
""",
}
