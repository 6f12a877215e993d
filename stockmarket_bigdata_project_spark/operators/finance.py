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
  drawdown_durations  below-peak episodes (gaps-and-islands, integer depth)
  trend_mann_kendall  Mann-Kendall S + Theil-Sen slope over the trailing
                      TREND_WINDOW dates (per-key-bounded pair join)

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
    constant factor, left to the caller).

    Exact-sum form (playbook rule 2): built-in windowed stddev folds partial
    moments with engine-specific recurrences, and round(·, 6) of the result
    is boundary-divergent (rule 1). Instead the per-row return is quantized
    at 7dp as an integer rational of the price cents, the frame sums S1/S2
    are exact BIGINT window sums, and the stddev is pure shared binary64:
    sqrt((S2 - S1²/n)/(n-1)) / 10^7. S2 goes long→double through a digit
    string (rule 3b) — DuckDB's window sum yields HUGEINT whose direct
    double cast is not correctly rounded past 2^53."""
    r = _returns(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("trade_date")
    c = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    p = F.lag(c, 1).over(w)
    num = F.abs(c - p) * F.lit(20_000_000).cast("long") + p
    den = 2 * p
    sign = F.when(c > p, F.lit(1)).when(c < p, F.lit(-1)).otherwise(F.lit(0))
    q7 = sign.cast("long") * ((num - F.pmod(num, den)) / den).cast("long")
    w5 = (
        Window.partitionBy("l_suppkey").orderBy("trade_date").rowsBetween(-4, 0)
    )
    base = r.withColumn("q7", q7)
    s1 = F.sum("q7").over(w5).cast("double")
    s2 = F.sum(F.col("q7") * F.col("q7")).over(w5).cast("string").cast("double")
    n = F.count("q7").over(w5).cast("double")
    return base.select(
        "l_suppkey",
        "trade_date",
        (
            F.sqrt(
                (s2 - s1 * s1 / n) / F.nullif(n - 1, F.lit(0.0))
            )
            / F.lit(1.0e7)
        ).alias("vol_5d"),
    )


def rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 10-day beta vs the market:
    beta = (avg(xm) - avg(x)avg(m)) / (avg(m²) - avg(m)²).

    Every input is an exact INTEGER in 1e-5 return units: x is the
    per-stock return quantized as an integer rational of the price cents
    (sign·round_half_up(|c−p|·10^5, p)), m is the cross-sectional mean
    re-quantized the same way from (Σx, n). All windowed means are then a
    single division of an order-exact sum — integer-valued doubles below
    2^53 add exactly under ANY association, including DuckDB's
    segment-tree window accumulation — and the closing algebra is shared
    binary64, so the raw quotient is bit-identical across engines and is
    emitted UNROUNDED. (The previous form averaged inexact doubles and
    rounded at 6dp; the r3 sf0.1 sweep caught a half-boundary row where
    the engines' low-bit window sums disagreed: -0.359674 vs -0.359673.
    Unit scale 1e5 bounds |x·m| ≤ (115·10^5)² ≈ 1.3e14, ×10 rows ≈ 1.3e15
    < 2^53, with measured max |ret| ≈ 114 at sf0.1.)"""
    r = _returns(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("trade_date")
    c = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    p = F.lag(c, 1).over(w)
    num = F.abs(c - p) * F.lit(200_000).cast("long") + p
    den = 2 * p
    sign = F.when(c > p, F.lit(1)).when(c < p, F.lit(-1)).otherwise(F.lit(0))
    x_units = sign.cast("long") * ((num - F.pmod(num, den)) / den).cast("long")
    per_stock = r.withColumn("x_units", x_units)
    ms = F.sum("x_units")
    n = F.count("x_units")
    mnum = 2 * F.abs(ms) + n
    mden = 2 * n
    msign = (
        F.when(ms > 0, F.lit(1)).when(ms < 0, F.lit(-1)).otherwise(F.lit(0))
    )
    market = per_stock.groupBy("trade_date").agg(
        (
            msign.cast("long")
            * ((mnum - F.pmod(mnum, mden)) / mden).cast("long")
        ).alias("m_units")
    )
    j = (
        per_stock.join(market, "trade_date")
        .filter(F.col("x_units").isNotNull() & F.col("m_units").isNotNull())
        .select(
            "l_suppkey",
            "trade_date",
            F.col("x_units").cast("double").alias("x"),
            F.col("m_units").cast("double").alias("m"),
        )
    )
    w10 = (
        Window.partitionBy("l_suppkey").orderBy("trade_date").rowsBetween(-9, 0)
    )
    cov = F.avg(F.col("x") * F.col("m")).over(w10) - F.avg("x").over(
        w10
    ) * F.avg("m").over(w10)
    var = F.avg(F.col("m") * F.col("m")).over(w10) - F.avg("m").over(
        w10
    ) * F.avg("m").over(w10)
    # var(m)=0 on the first window row → NULL beta (try_divide / NULLIF)
    return j.select(
        "l_suppkey",
        "trade_date",
        F.try_divide(cov, F.nullif(var, F.lit(0.0))).alias("beta_10d"),
    )


def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown per supplier + the max drawdown to date.

    dd = (close − peak)/peak quantized at 6dp as an integer rational of the
    price cents (q = round_half_up((P−c)·10^6, P), dd = −q/10^6): exact and
    engine-identical, where round(double, 6) of the raw ratio is
    boundary-divergent (playbook rule 1). min(dd) = −max(q) is an integer
    window max, so the running drawdown floor is exact too."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("trade_date").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    peak_c = F.max(c).over(w)
    num = (peak_c - c) * F.lit(2_000_000).cast("long") + peak_c
    den = 2 * peak_c
    # two steps: window functions can't nest (same restriction in DuckDB)
    with_q = s.withColumn(
        "q", ((num - F.pmod(num, den)) / den).cast("long")
    )
    # negate the INTEGER before the division: -(0/1e6) would emit -0.0
    return with_q.select(
        "l_suppkey",
        "trade_date",
        ((-F.col("q")).cast("double") / F.lit(1.0e6)).alias("drawdown"),
        (
            (-F.max("q").over(w)).cast("double") / F.lit(1.0e6)
        ).alias("max_drawdown_to_date"),
    )


def cumulative_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compounded return since inception. The generic shuffle-free cumprod
    idiom is exp(sum(ln(1+r))) − 1, but returns TELESCOPE —
    ∏(c_i/c_{i−1}) = c_t/c_0 — so the compounded return is computed as the
    exact price-cents ratio (close − first_close)/first_close: one shared
    binary64 division instead of a transcendental chain whose low bits
    differ per engine under any frame-sum association."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("l_suppkey").orderBy("trade_date")
    c = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    r = s.withColumn("c", c).withColumn("p", F.lag("c", 1).over(wo))
    r = r.filter(F.col("p").isNotNull())
    w = Window.partitionBy("l_suppkey").orderBy("trade_date").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c0 = F.first("p").over(w)
    return r.select(
        "l_suppkey",
        "trade_date",
        ((F.col("c") - c0).cast("double") / c0).alias("cum_return"),
    )


TREND_WINDOW = 30  # trailing trade dates per supplier entering the trend


def trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend diagnostics per supplier over the trailing TREND_WINDOW
    trade dates: the Mann-Kendall S statistic (Σ sign(c_j − c_i) over all
    date-ordered pairs) and the Theil-Sen slope (median of the pairwise
    slopes (c_j − c_i)/days) — the outlier-robust trend pair a quant
    dashboard computes where rolling_beta's least-squares fit is too
    fragile. Suppliers with a single trading day have no pairs and drop
    out (inner-join semantics, both engines).

    Determinism: prices as exact integer cents; sign() as a CASE (never a
    float signum); each slope is ONE binary64 division of exact integers
    < 2^53, so both engines produce the identical bit pattern; the median
    is the lower-rank order statistic — with tied slope values the
    selected VALUE is tie-order-independent.

    Scale shape: the all-pairs step is bounded per key — the trailing
    window caps it at C(TREND_WINDOW, 2) = 435 pairs per supplier — so
    the self-join is a hash equi-join on l_suppkey whose output is linear
    in suppliers, never days². One exchange on l_suppkey feeds the
    ranking window, the pair join, and both aggregates. [extension]"""
    s = supplier_daily_ohlcv(spark, sf_dir).select(
        "l_suppkey",
        "trade_date",
        F.round(F.col("close_px") * 100).cast("long").alias("cents"),
    )
    wrec = Window.partitionBy("l_suppkey").orderBy(F.desc("trade_date"))
    r = (
        s.withColumn("rec", F.row_number().over(wrec))
        .filter(F.col("rec") <= TREND_WINDOW)
        .select("l_suppkey", "trade_date", "cents")
    )
    a, b = r.alias("a"), r.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
        & (F.col("a.trade_date") < F.col("b.trade_date")),
    ).select(
        F.col("a.l_suppkey").alias("l_suppkey"),
        (F.col("b.cents") - F.col("a.cents")).alias("dy"),
        F.datediff("b.trade_date", "a.trade_date").alias("dx"),
    )
    pr = pairs.select(
        "l_suppkey",
        (F.col("dy").cast("double") / F.col("dx")).alias("slope"),
        F.when(F.col("dy") > 0, F.lit(1))
        .when(F.col("dy") < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("sgn"),
    )
    stats = pr.groupBy("l_suppkey").agg(
        F.count("*").alias("n_pairs"), F.sum("sgn").alias("mk_s")
    )
    wmed = Window.partitionBy("l_suppkey").orderBy("slope")
    wall = Window.partitionBy("l_suppkey")
    sen = (
        pr.withColumn("rn", F.row_number().over(wmed))
        .withColumn("np", F.count("*").over(wall))
        .filter(F.col("rn") == F.expr("(np + 1) DIV 2"))
        .select("l_suppkey", F.col("slope").alias("sen_slope"))
    )
    n_days = r.groupBy("l_suppkey").agg(F.count("*").alias("n_days"))
    return (
        n_days.join(stats, "l_suppkey")
        .join(sen, "l_suppkey")
        .select("l_suppkey", "n_days", "n_pairs", "mk_s", "sen_slope")
    )


QUERIES = {
    "vwap_daily": vwap_daily,
    "twap_hourly": twap_hourly,
    "rolling_volatility": rolling_volatility,
    "rolling_beta": rolling_beta,
    "max_drawdown": max_drawdown,
    "cumulative_return": cumulative_return,
    "trend_mann_kendall": trend_mann_kendall,
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
    "rolling_volatility": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
cents AS (
  SELECT l_suppkey, trade_date,
         CAST(round(close_px * 100) AS BIGINT) AS c,
         lag(CAST(round(close_px * 100) AS BIGINT), 1)
           OVER (PARTITION BY l_suppkey ORDER BY trade_date) AS p
  FROM stock
),
qr AS (
  SELECT l_suppkey, trade_date,
         (CASE WHEN c > p THEN 1 WHEN c < p THEN -1 ELSE 0 END)
           * CAST((num - (num % den)) / den AS BIGINT) AS q7
  FROM (SELECT *, abs(c - p) * 20000000 + p AS num, 2 * p AS den FROM cents)
)
SELECT l_suppkey, trade_date,
       sqrt((CAST(CAST(sum(q7 * q7) OVER w AS VARCHAR) AS DOUBLE)
             - CAST(sum(q7) OVER w AS DOUBLE) * CAST(sum(q7) OVER w AS DOUBLE)
               / CAST(count(q7) OVER w AS DOUBLE))
            / NULLIF(CAST(count(q7) OVER w AS DOUBLE) - 1, 0.0))
         / 10000000.0 AS vol_5d
FROM qr
WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
    "rolling_beta": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
cents AS (
  SELECT l_suppkey, trade_date,
         CAST(round(close_px * 100) AS BIGINT) AS c,
         lag(CAST(round(close_px * 100) AS BIGINT), 1)
           OVER (PARTITION BY l_suppkey ORDER BY trade_date) AS p
  FROM stock
),
qp AS (
  SELECT l_suppkey, trade_date,
         (CASE WHEN c > p THEN 1 WHEN c < p THEN -1 ELSE 0 END)
           * CAST((num - (num % den)) / den AS BIGINT) AS x_units
  FROM (SELECT *, abs(c - p) * 200000 + p AS num, 2 * p AS den
        FROM cents)
),
market AS (
  SELECT trade_date,
         (CASE WHEN ms > 0 THEN 1 WHEN ms < 0 THEN -1 ELSE 0 END)
           * CAST((mnum - (mnum % mden)) / mden AS BIGINT) AS m_units
  FROM (
    SELECT trade_date, sum(x_units) AS ms,
           2 * abs(sum(x_units)) + count(x_units) AS mnum,
           2 * count(x_units) AS mden
    FROM qp GROUP BY trade_date
  )
),
j AS (
  SELECT q.l_suppkey, q.trade_date,
         CAST(q.x_units AS DOUBLE) AS x, CAST(m.m_units AS DOUBLE) AS m
  FROM qp q JOIN market m USING (trade_date)
  WHERE q.x_units IS NOT NULL AND m.m_units IS NOT NULL
)
SELECT l_suppkey, trade_date,
       (avg(x * m) OVER w - avg(x) OVER w * avg(m) OVER w)
         / NULLIF(avg(m * m) OVER w - avg(m) OVER w * avg(m) OVER w, 0.0)
         AS beta_10d
FROM j
WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
""",
    "max_drawdown": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
qd AS (
  SELECT l_suppkey, trade_date,
         CAST((num - (num % den)) / den AS BIGINT) AS q
  FROM (
    SELECT l_suppkey, trade_date,
           (peak_c - c) * 2000000 + peak_c AS num,
           2 * peak_c AS den
    FROM (
      SELECT l_suppkey, trade_date,
             CAST(round(close_px * 100) AS BIGINT) AS c,
             max(CAST(round(close_px * 100) AS BIGINT))
               OVER (PARTITION BY l_suppkey ORDER BY trade_date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_c
      FROM stock
    )
  )
)
SELECT l_suppkey, trade_date,
       CAST(-q AS DOUBLE) / 1000000.0 AS drawdown,
       CAST(-max(q) OVER (PARTITION BY l_suppkey ORDER BY trade_date
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 1000000.0 AS max_drawdown_to_date
FROM qd
""",
    "cumulative_return": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
cents AS (
  SELECT l_suppkey, trade_date,
         CAST(round(close_px * 100) AS BIGINT) AS c,
         lag(CAST(round(close_px * 100) AS BIGINT), 1)
           OVER (PARTITION BY l_suppkey ORDER BY trade_date) AS p
  FROM stock
)
SELECT l_suppkey, trade_date,
       CAST(c - first_value(p) OVER w AS DOUBLE) / first_value(p) OVER w
         AS cum_return
FROM cents
WHERE p IS NOT NULL
WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",

    "trend_mann_kendall": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
recents AS (
  SELECT l_suppkey, trade_date, c FROM (
    SELECT l_suppkey, trade_date,
           CAST(round(close_px * 100) AS BIGINT) AS c,
           row_number() OVER (PARTITION BY l_suppkey
                              ORDER BY trade_date DESC) AS rec
    FROM stock
  ) WHERE rec <= {TREND_WINDOW}
),
prs AS (
  SELECT a.l_suppkey,
         CAST(b.c - a.c AS DOUBLE)
           / date_diff('day', a.trade_date, b.trade_date) AS slope,
         CASE WHEN b.c > a.c THEN 1
              WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
  FROM recents a JOIN recents b
    ON a.l_suppkey = b.l_suppkey AND a.trade_date < b.trade_date
),
st AS (
  SELECT l_suppkey, count(*) AS n_pairs,
         CAST(sum(sgn) AS BIGINT) AS mk_s
  FROM prs GROUP BY l_suppkey
),
sen AS (
  SELECT l_suppkey, slope AS sen_slope FROM (
    SELECT l_suppkey, slope,
           row_number() OVER (PARTITION BY l_suppkey ORDER BY slope) AS rn,
           count(*) OVER (PARTITION BY l_suppkey) AS np
    FROM prs
  ) WHERE rn = (np + 1) // 2
),
nd AS (
  SELECT l_suppkey, count(*) AS n_days FROM recents GROUP BY l_suppkey
)
SELECT n.l_suppkey, n.n_days, s.n_pairs, s.mk_s, m.sen_slope
FROM nd n JOIN st s USING (l_suppkey) JOIN sen m USING (l_suppkey)
""",
}


def drawdown_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown EPISODES per supplier: each maximal run of consecutive
    trading days strictly below the running peak, with its start/end
    date, length, and trough depth in integer micro units — the
    time-under-water table a risk report pairs with max_drawdown's
    pointwise series. Gaps-and-islands: below-peak rows grouped by
    rn − row_number-within-flag (the duplicate_spans idiom on the date
    axis); depth is max of the SAME integer q max_drawdown computes, so
    the two queries can't disagree.

    Shape: one suppkey exchange feeds the peak window, both ranks, and
    the episode aggregate. [extension]"""
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("trade_date").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    peak_c = F.max(c).over(w)
    num = (peak_c - c) * F.lit(2_000_000).cast("long") + peak_c
    den = 2 * peak_c
    base = s.select(
        "l_suppkey",
        "trade_date",
        ((num - F.pmod(num, den)) / den).cast("long").alias("q"),
    )
    wall = Window.partitionBy("l_suppkey").orderBy("trade_date")
    wflag = Window.partitionBy("l_suppkey", "under").orderBy("trade_date")
    grouped = (
        base.withColumn("under", (F.col("q") > 0).cast("int"))
        .withColumn(
            "grp",
            F.row_number().over(wall) - F.row_number().over(wflag),
        )
        .filter(F.col("under") == 1)
    )
    return grouped.groupBy("l_suppkey", "grp").agg(
        F.min("trade_date").alias("start_date"),
        F.max("trade_date").alias("end_date"),
        F.count("*").alias("n_days"),
        F.max("q").alias("trough_micro"),
    ).select(
        "l_suppkey", "start_date", "end_date", "n_days", "trough_micro"
    )


QUERIES["drawdown_durations"] = drawdown_durations

ORACLE["drawdown_durations"] = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
qd AS (
  SELECT l_suppkey, trade_date,
         ((peak_c - c) * 2000000 + peak_c) // (2 * peak_c) AS q
  FROM (
    SELECT l_suppkey, trade_date,
           CAST(round(close_px * 100) AS BIGINT) AS c,
           max(CAST(round(close_px * 100) AS BIGINT))
             OVER (PARTITION BY l_suppkey ORDER BY trade_date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS peak_c
    FROM stock
  )
), flagged AS (
  SELECT l_suppkey, trade_date, q,
         CASE WHEN q > 0 THEN 1 ELSE 0 END AS under,
         row_number() OVER (PARTITION BY l_suppkey ORDER BY trade_date)
           - row_number() OVER (PARTITION BY l_suppkey,
                                CASE WHEN q > 0 THEN 1 ELSE 0 END
                                ORDER BY trade_date) AS grp
  FROM qd
)
SELECT l_suppkey, min(trade_date) AS start_date,
       max(trade_date) AS end_date, count(*) AS n_days,
       CAST(max(q) AS BIGINT) AS trough_micro
FROM flagged WHERE under = 1
GROUP BY l_suppkey, grp
"""


# --- ATR channels (Keltner-style bands, exact arithmetic) --------------------
ATR_W = 5  # trailing window, rows (days with trades), matching vol_5d


def atr_bands_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volatility channels from the Average True Range (Wilder's TR, SMA
    variant): per (supplier, day), mid = SMA(close) over the trailing
    ATR_W rows, ATR = SMA(true range) with
    TR = greatest(high, prev_close) − least(low, prev_close), and bands
    mid ± 2·ATR — the Keltner-channel shape every charting stack ships
    and the reference's dashboard hints at but never computes.

    Exactness (playbook §2): prices are 2-decimal by construction, so TR
    and the window sums are exact BIGINT cents; each output is ONE
    binary64 division of an exact integer by (100·n) followed by pure
    IEEE add/multiply — bit-identical on both engines. First row of a
    key has no prev_close: TR degrades to high−low (coalesce), the
    standard seeding.

    Scale: shares the (l_suppkey, trade_date) exchange of every query in
    this pack — one hash partition + in-partition sort feeds the lag and
    both rolling sums; frames are row-bounded (constant state per row).
    [extension]"""
    s = supplier_daily_ohlcv(spark, sf_dir)
    cents = s.select(
        "l_suppkey",
        "trade_date",
        F.expr("CAST(round(high_px * 100) AS BIGINT)").alias("h"),
        F.expr("CAST(round(low_px * 100) AS BIGINT)").alias("l"),
        F.expr("CAST(round(close_px * 100) AS BIGINT)").alias("c"),
    )
    w0 = Window.partitionBy("l_suppkey").orderBy("trade_date")
    w = w0.rowsBetween(-(ATR_W - 1), 0)
    tr = cents.withColumn("p", F.lag("c", 1).over(w0)).withColumn(
        "tr",
        F.greatest("h", F.coalesce("p", "h"))
        - F.least("l", F.coalesce("p", "l")),
    )
    n = F.count("c").over(w)
    mid = F.sum("c").over(w).cast("double") / (F.lit(100.0) * n)
    atr = F.sum("tr").over(w).cast("double") / (F.lit(100.0) * n)
    return tr.select(
        "l_suppkey",
        "trade_date",
        mid.alias("mid_px"),
        atr.alias("atr"),
        (mid + 2 * atr).alias("upper_band"),
        (mid - 2 * atr).alias("lower_band"),
    )


QUERIES["atr_bands_exact"] = atr_bands_exact

ORACLE["atr_bands_exact"] = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
cents AS (
  SELECT l_suppkey, trade_date,
         CAST(round(high_px * 100) AS BIGINT) AS h,
         CAST(round(low_px * 100) AS BIGINT) AS l,
         CAST(round(close_px * 100) AS BIGINT) AS c
  FROM stock
),
tr AS (
  SELECT l_suppkey, trade_date, c,
         greatest(h, coalesce(p, h)) - least(l, coalesce(p, l)) AS tr
  FROM (SELECT *, lag(c, 1) OVER (PARTITION BY l_suppkey
                                  ORDER BY trade_date) AS p
        FROM cents)
)
SELECT l_suppkey, trade_date,
       CAST(sum(c) OVER w AS DOUBLE) / (100.0 * count(c) OVER w) AS mid_px,
       CAST(sum(tr) OVER w AS DOUBLE) / (100.0 * count(c) OVER w) AS atr,
       CAST(sum(c) OVER w AS DOUBLE) / (100.0 * count(c) OVER w)
         + 2 * (CAST(sum(tr) OVER w AS DOUBLE)
                / (100.0 * count(c) OVER w)) AS upper_band,
       CAST(sum(c) OVER w AS DOUBLE) / (100.0 * count(c) OVER w)
         - 2 * (CAST(sum(tr) OVER w AS DOUBLE)
                / (100.0 * count(c) OVER w)) AS lower_band
FROM tr
WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date
             ROWS BETWEEN {ATR_W - 1} PRECEDING AND CURRENT ROW)
"""


# --- candlestick pattern screen ----------------------------------------------
def candlestick_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier candlestick pattern counts over the daily OHLC bars —
    doji, hammer, bullish/bearish engulfing — the classic charting
    screens, each an INTEGER comparison on price cents (body/shadow/range
    cross-multiplications, lag for the engulfing prior bar), so the whole
    screen is exact and map-side past one (l_suppkey, trade_date) window
    exchange + the per-supplier rollup. Definitions (cents):
    body=|c−o|, range=h−l, shadows vs greatest/least(o,c);
    doji: 20·body ≤ range, range>0; hammer: lower shadow ≥ 2·body,
    upper shadow ≤ body, range>0; engulfing: current body strictly
    opposite-signed and enclosing the prior body. [extension]"""
    s = supplier_daily_ohlcv(spark, sf_dir)
    cents = s.select(
        "l_suppkey",
        "trade_date",
        F.expr("CAST(round(open_px * 100) AS BIGINT)").alias("o"),
        F.expr("CAST(round(high_px * 100) AS BIGINT)").alias("h"),
        F.expr("CAST(round(low_px * 100) AS BIGINT)").alias("l"),
        F.expr("CAST(round(close_px * 100) AS BIGINT)").alias("c"),
    )
    w = Window.partitionBy("l_suppkey").orderBy("trade_date")
    b = (
        cents.withColumn("po", F.lag("o", 1).over(w))
        .withColumn("pc", F.lag("c", 1).over(w))
        .withColumn("body", F.abs(F.col("c") - F.col("o")))
        .withColumn("rng", F.col("h") - F.col("l"))
        .withColumn("ush", F.col("h") - F.greatest("o", "c"))
        .withColumn("lsh", F.least("o", "c") - F.col("l"))
    )
    doji = (20 * F.col("body") <= F.col("rng")) & (F.col("rng") > 0)
    hammer = (
        (F.col("lsh") >= 2 * F.col("body"))
        & (F.col("ush") <= F.col("body"))
        & (F.col("rng") > 0)
    )
    bull = (
        (F.col("pc") < F.col("po"))
        & (F.col("c") > F.col("o"))
        & (F.col("o") <= F.col("pc"))
        & (F.col("c") >= F.col("po"))
    )
    bear = (
        (F.col("pc") > F.col("po"))
        & (F.col("c") < F.col("o"))
        & (F.col("o") >= F.col("pc"))
        & (F.col("c") <= F.col("po"))
    )
    return b.groupBy("l_suppkey").agg(
        F.count("*").alias("n_days"),
        F.sum(doji.cast("long")).alias("n_doji"),
        F.sum(hammer.cast("long")).alias("n_hammer"),
        F.sum(F.coalesce(bull, F.lit(False)).cast("long")).alias("n_bull_engulf"),
        F.sum(F.coalesce(bear, F.lit(False)).cast("long")).alias("n_bear_engulf"),
    )


QUERIES["candlestick_patterns"] = candlestick_patterns

ORACLE["candlestick_patterns"] = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
cents AS (
  SELECT l_suppkey, trade_date,
         CAST(round(open_px * 100) AS BIGINT) AS o,
         CAST(round(high_px * 100) AS BIGINT) AS h,
         CAST(round(low_px * 100) AS BIGINT) AS l,
         CAST(round(close_px * 100) AS BIGINT) AS c
  FROM stock
),
b AS (
  SELECT l_suppkey,
         lag(o, 1) OVER w AS po, lag(c, 1) OVER w AS pc,
         o, h, l, c,
         abs(c - o) AS body, h - l AS rng,
         h - greatest(o, c) AS ush, least(o, c) - l AS lsh
  FROM cents
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date)
)
SELECT l_suppkey, count(*) AS n_days,
       CAST(sum(CASE WHEN 20 * body <= rng AND rng > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_doji,
       CAST(sum(CASE WHEN lsh >= 2 * body AND ush <= body AND rng > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_hammer,
       CAST(sum(CASE WHEN pc < po AND c > o AND o <= pc AND c >= po
                THEN 1 ELSE 0 END) AS BIGINT) AS n_bull_engulf,
       CAST(sum(CASE WHEN pc > po AND c < o AND o >= pc AND c <= po
                THEN 1 ELSE 0 END) AS BIGINT) AS n_bear_engulf
FROM b GROUP BY l_suppkey
"""


# --- trading-gap audit -------------------------------------------------------
def trading_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier trading-calendar gap audit: count and size of
    missing-day runs between consecutive observed bars — the
    data-completeness screen run before any rolling/interpolation
    consumer (interpolate_daily's diagnosis half). Pure date arithmetic:
    gap = datediff(day, prev_day) − 1 via one lag over the shared
    (l_suppkey, trade_date) exchange, then one per-supplier rollup.
    Output BIGINTs + the observed span. [extension]"""
    s = supplier_daily_ohlcv(spark, sf_dir).select("l_suppkey", "trade_date")
    w = Window.partitionBy("l_suppkey").orderBy("trade_date")
    g = s.withColumn(
        "gap",
        F.datediff(F.col("trade_date"), F.lag("trade_date", 1).over(w)) - 1,
    )
    return g.groupBy("l_suppkey").agg(
        F.count("*").alias("n_days"),
        F.min("trade_date").alias("first_day"),
        F.max("trade_date").alias("last_day"),
        (
            F.datediff(F.max("trade_date"), F.min("trade_date")) + 1
        ).cast("long").alias("span_days"),
        F.sum((F.col("gap") > 0).cast("long")).alias("n_gaps"),
        F.coalesce(F.sum(F.when(F.col("gap") > 0, F.col("gap"))), F.lit(0))
        .cast("long")
        .alias("missing_days"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap"),
    )


QUERIES["trading_gap_report"] = trading_gap_report

ORACLE["trading_gap_report"] = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
g AS (
  SELECT l_suppkey, trade_date,
         date_diff('day',
                   lag(trade_date, 1) OVER (PARTITION BY l_suppkey
                                            ORDER BY trade_date),
                   trade_date) - 1 AS gap
  FROM stock
)
SELECT l_suppkey, count(*) AS n_days,
       min(trade_date) AS first_day, max(trade_date) AS last_day,
       CAST(date_diff('day', min(trade_date), max(trade_date)) + 1
            AS BIGINT) AS span_days,
       CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       CAST(coalesce(sum(CASE WHEN gap > 0 THEN gap END), 0) AS BIGINT)
         AS missing_days,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap
FROM g GROUP BY l_suppkey
"""


# --- lead-lag cross-correlation vs the market --------------------------------
XCORR_LAGS = (-2, -1, 0, 1, 2)  # market shift in TRADING days


def leadlag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag structure: full-period Pearson cross-correlation between
    each supplier's daily return and the MARKET return shifted by
    -2..+2 trading days. Sign convention: lag L pairs the stock return
    at trading-day index i with the market return at index i+L
    (x_idx = idx − lag below), so a high POSITIVE-lag correlation means
    today's stock return co-moves with the FUTURE market return — the
    STOCK leads the market; negative lags test the market leading the
    stock (the classic lagged-beta/price-discovery diagnostic). Inputs are the same exact 1e-5-unit integer returns as
    rolling_beta (per-stock quantized rational; market = re-quantized
    cross-sectional mean — expressions duplicated verbatim from
    rolling_beta, which is hash-proven, rather than refactoring a proven
    query). All six sufficient statistics (n, Σx, Σm, Σx², Σm², Σxm)
    are exact BIGINT aggregates; Σ of squares/products can pass 2^53 so
    they go long→double through a digit string (playbook rule 3b); the
    closing corr algebra is shared binary64, emitted unrounded.

    Scale: the trading-day index is a row_number over the DATE DIMENSION
    (one row per distinct date — a single-partition window over a
    dimension-sized relation, the date-dim build every warehouse does);
    the fact side then equi-joins (date → idx, idx+lag → market), lags
    fan out 5× on the DIMENSION only, and the stats are one partial+final
    hash aggregate on (l_suppkey, lag). [extension]"""
    r = _returns(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("trade_date")
    c = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    p = F.lag(c, 1).over(w)
    num = F.abs(c - p) * F.lit(200_000).cast("long") + p
    den = 2 * p
    sign = F.when(c > p, F.lit(1)).when(c < p, F.lit(-1)).otherwise(F.lit(0))
    x_units = sign.cast("long") * ((num - F.pmod(num, den)) / den).cast("long")
    per_stock = r.withColumn("x_units", x_units).filter(
        F.col("x_units").isNotNull()
    )
    ms = F.sum("x_units")
    n = F.count("x_units")
    mnum = 2 * F.abs(ms) + n
    mden = 2 * n
    msign = (
        F.when(ms > 0, F.lit(1)).when(ms < 0, F.lit(-1)).otherwise(F.lit(0))
    )
    market = per_stock.groupBy("trade_date").agg(
        (
            msign.cast("long")
            * ((mnum - F.pmod(mnum, mden)) / mden).cast("long")
        ).alias("m_units")
    )
    idx = market.withColumn(
        "idx", F.row_number().over(Window.orderBy("trade_date"))
    )
    lags = F.explode(F.array(*[F.lit(v) for v in XCORR_LAGS])).alias("lag")
    shifted = (
        idx.select("idx", "m_units")
        .select("idx", "m_units", lags)
        .select((F.col("idx") - F.col("lag")).alias("x_idx"), "lag", "m_units")
    )
    x_side = per_stock.join(
        idx.select("trade_date", F.col("idx").alias("x_idx")), "trade_date"
    ).select("l_suppkey", "x_idx", "x_units")
    j = x_side.join(shifted, "x_idx").select(
        "l_suppkey",
        "lag",
        F.col("x_units").alias("x"),
        F.col("m_units").alias("m"),
    )
    agg = j.groupBy("l_suppkey", "lag").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("m").alias("sm"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.col("x") * F.col("m")).alias("sxm"),
    )
    nd = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sm = F.col("sm").cast("double")
    sxx = F.col("sxx").cast("string").cast("double")
    smm = F.col("smm").cast("string").cast("double")
    sxm = F.col("sxm").cast("string").cast("double")
    denom = F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * smm - sm * sm)
    return agg.select(
        "l_suppkey",
        "lag",
        "n_days",
        ((nd * sxm - sx * sm) / F.nullif(denom, F.lit(0.0))).alias("xcorr"),
    )


QUERIES["leadlag_xcorr"] = leadlag_xcorr

_XCORR_LAGS_SQL = ", ".join(f"({v})" for v in XCORR_LAGS)

ORACLE["leadlag_xcorr"] = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
cents AS (
  SELECT l_suppkey, trade_date,
         CAST(round(close_px * 100) AS BIGINT) AS c,
         lag(CAST(round(close_px * 100) AS BIGINT), 1)
           OVER (PARTITION BY l_suppkey ORDER BY trade_date) AS p
  FROM stock
),
qp AS (
  SELECT l_suppkey, trade_date,
         (CASE WHEN c > p THEN 1 WHEN c < p THEN -1 ELSE 0 END)
           * CAST((num - (num % den)) / den AS BIGINT) AS x_units
  FROM (SELECT *, abs(c - p) * 200000 + p AS num, 2 * p AS den
        FROM cents)
  WHERE p IS NOT NULL
),
market AS (
  SELECT trade_date,
         (CASE WHEN ms > 0 THEN 1 WHEN ms < 0 THEN -1 ELSE 0 END)
           * CAST((mnum - (mnum % mden)) / mden AS BIGINT) AS m_units
  FROM (
    SELECT trade_date, sum(x_units) AS ms,
           2 * abs(sum(x_units)) + count(x_units) AS mnum,
           2 * count(x_units) AS mden
    FROM qp GROUP BY trade_date
  )
),
midx AS (
  SELECT trade_date, m_units,
         CAST(row_number() OVER (ORDER BY trade_date) AS INTEGER) AS idx
  FROM market
),
shifted AS (
  SELECT m.idx - l.lag AS x_idx, l.lag, m.m_units
  FROM midx m CROSS JOIN (VALUES {_XCORR_LAGS_SQL}) AS l(lag)
),
j AS (
  SELECT q.l_suppkey, s.lag, q.x_units AS x, s.m_units AS m
  FROM qp q
  JOIN midx i USING (trade_date)
  JOIN shifted s ON s.x_idx = i.idx
),
agg AS (
  SELECT l_suppkey, lag, count(*) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(m) AS BIGINT) AS sm,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(m * m) AS BIGINT) AS smm,
         CAST(sum(x * m) AS BIGINT) AS sxm
  FROM j GROUP BY l_suppkey, lag
)
SELECT l_suppkey, CAST(lag AS INTEGER) AS lag, n_days,
       (CAST(n_days AS DOUBLE) * CAST(CAST(sxm AS VARCHAR) AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE))
       / NULLIF(
           sqrt(CAST(n_days AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * sqrt(CAST(n_days AS DOUBLE) * CAST(CAST(smm AS VARCHAR) AS DOUBLE)
                  - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)),
           0.0) AS xcorr
FROM agg
"""


# --- on-balance volume -------------------------------------------------------
def obv_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-Balance Volume (Granville): per supplier, the running sum of daily
    volume signed by the close-to-close direction — the classic
    volume-confirms-price accumulation gauge. direction ∈ {+1, -1, 0}
    (0 for an unchanged close AND for the first trading day, where lag is
    NULL — both engines' CASE falls through to ELSE 0). Volume is an
    integer-valued quantity sum, so direction·volume and the running OBV
    are pure BIGINT arithmetic — bit-exact in any engine, no float in the
    pipeline. Output: (l_suppkey, trade_date, direction, obv).

    Scale shape: shares supplier_daily_ohlcv's single (l_suppkey) hash
    exchange; the lag and the running sum ride the same window sort —
    constant state per row. [extension]"""
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("trade_date")
    prev = F.lag("close_px", 1).over(w)
    direction = (
        F.when(F.col("close_px") > prev, 1)
        .when(F.col("close_px") < prev, -1)
        .otherwise(0)
    )
    b = s.select(
        "l_suppkey",
        "trade_date",
        direction.cast("int").alias("direction"),
        F.col("volume").cast("long").alias("vol"),
    )
    w_cum = (
        Window.partitionBy("l_suppkey")
        .orderBy("trade_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return b.select(
        "l_suppkey",
        "trade_date",
        "direction",
        F.sum(F.col("direction") * F.col("vol")).over(w_cum).alias("obv"),
    )


QUERIES["obv_indicator"] = obv_indicator

ORACLE["obv_indicator"] = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
dirs AS (
  SELECT l_suppkey, trade_date,
         CAST(CASE
           WHEN close_px > lag(close_px, 1) OVER w THEN 1
           WHEN close_px < lag(close_px, 1) OVER w THEN -1
           ELSE 0
         END AS INTEGER) AS direction,
         CAST(volume AS BIGINT) AS vol
  FROM stock
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date)
)
SELECT l_suppkey, trade_date, direction,
       CAST(sum(direction * vol) OVER (
         PARTITION BY l_suppkey ORDER BY trade_date
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS obv
FROM dirs
"""
