"""Serving layer: the dashboard snapshot query + the TTL-cache refresh
harness (reference orchestration/app.py).

The reference serves a Streamlit dashboard that polls MongoDB every 10 s
(app.py:27-34 st_autorefresh; app.py:66,120 @st.cache_data(ttl=10)) and
derives its Overview metrics in pandas per selected ticker (app.py:155-180):
current price (last close), daily change % (last vs previous close), total
activity, prediction accuracy (100 − mean |prediction_pct_error|). Here the
metric derivation is ONE declarative per-key snapshot query over the gold
surface — at 100 TB the dashboard reads a tiny pre-aggregated result, it
does not pull raw rows into pandas — and the polling loop is a deterministic
TTL cache around any registered query (the autorefresh/cache_data harness
without the UI).

Determinism: every derived metric is integer-exact (playbook rules 1/11) —
the daily change is a sign·round-half-up rational in micro-percent units,
the accuracy numerator recovers prediction_pct_error's exact micro integer,
and every oracle aggregate is CAST to BIGINT.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .ml import _PRED_SQL, predict_returns
from .operators.gold import SUPPLIER_DAILY_SQL, supplier_daily_ohlcv


def dashboard_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ticker Overview metrics (app.py:155-180) as one query:
    trading-day count, last close, daily change in micro-percent
    (sign·round-half-up((last−prev)/prev·100·10^6) — BIGINT, NULL for
    single-day keys), total volume, and the prediction-accuracy pair
    (n_preds, Σ|pct_error| in exact micro units; the dashboard's
    '100 − mean |error|' is sum/n at display time).

    Scale shape: one hash exchange on l_suppkey for the last/prev window
    (in-key sort only), the prediction aggregate joins back on the same
    key, result is K-row (one per ticker) — the dashboard polls THIS, not
    raw rows."""
    daily = supplier_daily_ohlcv(spark, sf_dir).select(
        "l_suppkey",
        "trade_date",
        F.expr("CAST(round(close_px * 100) AS BIGINT)").alias("cents"),
        "volume",
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("trade_date"))
    ranked = daily.withColumn("rn", F.row_number().over(w))
    per_key = ranked.groupBy("l_suppkey").agg(
        F.count("*").alias("n_days"),
        F.max(F.when(F.col("rn") == 1, F.col("cents"))).alias("lc"),
        F.max(F.when(F.col("rn") == 2, F.col("cents"))).alias("pc"),
        F.sum("volume").alias("total_volume"),
    )
    d = F.col("lc") - F.col("pc")
    sign = F.when(d > 0, 1).when(d < 0, -1).otherwise(0).cast("long")
    # nullif guard: a 0-cent previous close must yield NULL on both engines,
    # not Spark-NULL vs DuckDB division-by-zero (same class stats.py fixed)
    pct_micro = sign * F.expr(
        "(2 * abs(lc - pc) * 100000000 + pc) DIV nullif(2 * pc, 0)"
    )
    p = predict_returns(spark, sf_dir)
    err_micro = F.floor(
        (F.col("predicted_price") - F.col("close_px"))
        / F.col("close_px")
        * 100
        * F.lit(1000000.0)
        + F.lit(0.5)
    )
    pred_stats = p.groupBy("l_suppkey").agg(
        F.count("*").alias("n_preds"),
        F.sum(F.abs(err_micro)).alias("sum_abs_pct_err_micro"),
    )
    return (
        per_key.join(pred_stats, "l_suppkey", "left")
        .select(
            "l_suppkey",
            "n_days",
            (F.col("lc") / 100.0).alias("last_close"),
            pct_micro.alias("pct_change_micro"),
            "total_volume",
            F.coalesce("n_preds", F.lit(0)).alias("n_preds"),
            F.coalesce("sum_abs_pct_err_micro", F.lit(0)).alias(
                "sum_abs_pct_err_micro"
            ),
        )
    )


QUERIES = {"dashboard_snapshot": dashboard_snapshot}

# The pr CTE recomputes predicted_price inline so the two floor
# quantizations (price at 4dp, then pct-error at 6dp-micro) run in the
# exact op order of predict_returns + the Spark side above.
ORACLE = {}
ORACLE["dashboard_snapshot"] = f"""
WITH daily AS (
  SELECT l_suppkey, trade_date,
         CAST(round(close_px * 100) AS BIGINT) AS cents, volume
  FROM ({SUPPLIER_DAILY_SQL})
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY l_suppkey
                               ORDER BY trade_date DESC) AS rn
  FROM daily
), per_key AS (
  SELECT l_suppkey, count(*) AS n_days,
         max(CASE WHEN rn = 1 THEN cents END) AS lc,
         max(CASE WHEN rn = 2 THEN cents END) AS pc,
         sum(volume) AS total_volume
  FROM ranked GROUP BY l_suppkey
), pr AS (
  SELECT l_suppkey, close_px,
         floor(close_px * (1 + pred) * 10000.0 + 0.5) / 10000.0
           AS predicted_price
  FROM ({_PRED_SQL})
), preds AS (
  SELECT l_suppkey, count(*) AS n_preds,
         CAST(sum(abs(CAST(floor((predicted_price - close_px) / close_px
                                 * 100 * 1000000.0 + 0.5) AS BIGINT)))
              AS BIGINT) AS sum_abs_pct_err_micro
  FROM pr GROUP BY l_suppkey
)
SELECT k.l_suppkey, k.n_days,
       k.lc / 100.0 AS last_close,
       (CASE WHEN k.lc > k.pc THEN 1 WHEN k.lc < k.pc THEN -1 ELSE 0 END)
         * ((2 * abs(k.lc - k.pc) * 100000000 + k.pc) // nullif(2 * k.pc, 0))
         AS pct_change_micro,
       k.total_volume,
       coalesce(p.n_preds, 0) AS n_preds,
       coalesce(p.sum_abs_pct_err_micro, 0) AS sum_abs_pct_err_micro
FROM per_key k LEFT JOIN preds p USING (l_suppkey)
"""


# --- the autorefresh/cache harness (app.py:27-34,66) ------------------------
@dataclass
class CachedQuery:
    """TTL cache around a (spark, sf_dir) query — the engine-side analog of
    @st.cache_data(ttl=10) + st_autorefresh: the dashboard polls get()
    every refresh tick; the query only re-executes when the cached result
    is older than ttl_seconds. The clock is injectable so refresh behavior
    is deterministic under test (and the cached value is the COLLECTED
    K-row snapshot — the driver holds rows, never a live DataFrame)."""

    fn: object  # Callable[[SparkSession, str], DataFrame]
    ttl_seconds: float = 10.0
    _rows: list = field(default_factory=list)
    _fetched_at: float | None = None
    refresh_count: int = 0

    def get(self, spark: SparkSession, sf_dir: str, now: float | None = None):
        t = time.monotonic() if now is None else now
        if self._fetched_at is None or t - self._fetched_at >= self.ttl_seconds:
            self._rows = self.fn(spark, sf_dir).collect()
            self._fetched_at = t
            self.refresh_count += 1
        return self._rows
