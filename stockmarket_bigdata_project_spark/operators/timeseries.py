"""Time-series / window operators over the (key, date)-partitioned pattern.

The reference does all of these in pandas (notebooks); the engine makes the
time series keyed by (ticker, date) a first-class Spark pattern:
``Window.partitionBy(key).orderBy(date)`` (SURVEY §1.1, §2.5). Window
functions execute inside whole-stage codegen after a single shuffle on the
partition key — at 100 TB every per-key series lands on one executor once and
all window ops reuse that partitioning.

Reference parity cites (into /root/reference):
  W1 lead (next-day close)   02_train_baseline_model.ipynb cell 2 (shift(-1))
  W2 lag features            02_..ipynb cell 2 (shift(1))
  W3 percent change          app.py:86,349; 06_..ipynb cell 4 (pct_change)
  W4 3-day rolling mean      02_..ipynb cell 2 (rolling(3).mean())
  W5 sign-of-diff direction  app.py:411-415 (np.sign(diff))
  W6 sliding sequence (LSTM) 03_LSTM.ipynb cell 3 (SEQ_LEN window assembly)
  W7 day-floor bucketing     05_..ipynb cell 2 (dt.floor("D"))
  W8 greatest-n-per-group    predictor_service.py:38-42 (sort desc, limit 1)
  direction quirk            01_..ipynb cell 2: strict > ; ties → 0 (SURVEY §7.3-7)
Extensions: rank/dense_rank/ntile, top-k per group, running totals,
sessionization (gap > threshold) — absent in the reference, standard for the
capability surface.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..functions.exact import dec_sum
from .gold import SUPPLIER_DAILY_SQL, supplier_daily_ohlcv

# canonical per-key time-series window
def _w():
    return Window.partitionBy("l_suppkey").orderBy("trade_date")


def _stock_cte(select_sql: str) -> str:
    return f"WITH stock AS ({SUPPLIER_DAILY_SQL})\n{select_sql}"


# --- W1: lead (next-day close target) + strict-> direction -------------------
def lead_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    close_next = F.lead("close_px", 1).over(_w())
    return s.select(
        "l_suppkey",
        "trade_date",
        "close_px",
        close_next.alias("close_next"),
        F.when(close_next > F.col("close_px"), 1)
        .when(close_next.isNull(), None)
        .otherwise(0)
        .alias("direction"),
    )


# --- W2: lag features --------------------------------------------------------
def lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = _w()
    return s.select(
        "l_suppkey",
        "trade_date",
        "close_px",
        F.lag("close_px", 1).over(w).alias("prev_close"),
        F.lag("volume", 1).over(w).alias("prev_volume"),
        F.lag("high_px", 2).over(w).alias("high_2d_ago"),
    )


# --- W3: percent change (returns) -------------------------------------------
def pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = _w()
    prev = F.lag("close_px", 1).over(w)
    nxt = F.lead("close_px", 1).over(w)
    return s.select(
        "l_suppkey",
        "trade_date",
        F.round(F.col("close_px") / prev - 1, 6).alias("ret"),
        F.round(nxt / F.col("close_px") - 1, 6).alias("next_ret"),
        F.round((F.col("close_px") - F.col("open_px")) / F.col("open_px"), 6).alias(
            "intraday_ret"
        ),
    )


# --- W4: rolling mean (3-row, min_periods=1 semantics) ----------------------
def rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    w3 = _w().rowsBetween(-2, 0)
    # close_px is 2-decimal: a decimal window sum is exact under Spark's
    # sliding add/remove AND DuckDB's segment tree (different association
    # orders — inexact double frames can drift apart). volume is
    # integer-valued, already exact either way.
    return s.select(
        "l_suppkey",
        "trade_date",
        (
            F.sum(F.col("close_px").cast("decimal(27,2)")).over(w3).cast("double")
            / F.count("close_px").over(w3)
        ).alias("rolling_avg_close"),
        (F.sum("volume").over(w3) / F.count("volume").over(w3)).alias(
            "rolling_avg_volume"
        ),
    )


# --- rolling exact median (order-statistic window) [extension] --------------
def rolling_median_5row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-row exact median of close_px per supplier — the order-
    statistic window Spark has no native aggregate for, composed as
    sort_array(collect_list(cents)) over the bounded frame + pure integer
    indexing (odd n → middle, even n → mean of the two middles as one
    binary64 division of an exact integer-cents sum — engine-neutral,
    where DuckDB's native median() interpolation would be a float-path
    hash risk). State per row is the 5-element frame, constant — same
    bounded-frame argument as sequence_assembly."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    w5 = _w().rowsBetween(-4, 0)
    cents = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    arr = F.sort_array(F.collect_list(cents).over(w5))
    n = F.size(arr)
    lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    return s.select(
        "l_suppkey",
        "trade_date",
        n.alias("n_obs"),
        ((lo + hi).cast("double") / 200.0).alias("rolling_median_close"),
    )


# --- W5: sign-of-diff direction ---------------------------------------------
def direction_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    diff = F.col("close_px") - F.lag("close_px", 1).over(_w())
    return s.select(
        "l_suppkey",
        "trade_date",
        F.signum(diff).cast("int").alias("direction"),
    )


# --- W6: sliding sequence assembly (LSTM input windows) ---------------------
def sequence_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list over a bounded preceding frame — the set-based form of the
    reference's per-row python loop building SEQ_LEN=5 feature sequences."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    wseq = _w().rowsBetween(-5, -1)
    seq = F.collect_list("close_px").over(wseq)
    # The sequence is surfaced as a '|'-joined string of exact integer cents,
    # not a raw array<double>: the driver's value canonicalizer can't sort
    # list cells (round 1: "unhashable type: 'list'"), and integer→string
    # rendering is identical on Spark and DuckDB where double→string is not
    # (Java Double.toString vs shortest-repr). The sum folds the same cents.
    cents = F.transform(F.col("seq"), lambda x: F.round(x * 100).cast("bigint"))
    return (
        s.select("l_suppkey", "trade_date", seq.alias("seq"))
        .filter(F.size("seq") == 5)
        .select(
            "l_suppkey",
            "trade_date",
            F.concat_ws("|", cents.cast("array<string>")).alias("seq_cents"),
            F.size("seq").alias("seq_len"),
            (
                F.aggregate(cents, F.lit(0).cast("bigint"), lambda a, x: a + x)
                / 100.0
            ).alias("seq_sum"),
        )
    )


# --- W7: day-floor bucketing -------------------------------------------------
def daily_event_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            dec_sum("value").alias(
                "day_value"
            ),
        )
    )


# --- W8: greatest-n-per-group (latest row per key) --------------------------
def latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("trade_date"))
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_suppkey", "trade_date", "close_px")
    )


# --- [extension] ranking functions ------------------------------------------
def rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    wd = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(wp).alias("rnk"),
        F.dense_rank().over(wp).alias("drnk"),
        F.ntile(4).over(wd).alias("quartile"),
    )


# --- [extension] top-k per group --------------------------------------------
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --- [extension] running total ----------------------------------------------
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    wcum = _w().rowsBetween(Window.unboundedPreceding, 0)
    return s.select(
        "l_suppkey",
        "trade_date",
        F.sum("volume").over(wcum).alias("cum_volume"),
    )


# --- [extension] time-range rolling window (RANGE frame) --------------------
def rolling_mean_7d_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-calendar-day trailing average close per supplier — a RANGE frame
    keyed on days-since-epoch, not a ROWS frame: with gaps in the series the
    two differ (a ROWS(-6,0) frame would reach back further than a week).
    This is the correct form for 'last N days' features at any scale; the
    window still executes on the single (l_suppkey) shuffle every other
    time-series op reuses. Decimal window sums per the determinism playbook
    (Spark's sliding add/remove vs DuckDB's segment tree associate float
    additions differently)."""
    s = supplier_daily_ohlcv(spark, sf_dir).withColumn(
        "day_num", F.datediff("trade_date", F.lit("1970-01-01"))
    )
    w7 = (
        Window.partitionBy("l_suppkey")
        .orderBy("day_num")
        .rangeBetween(-6, 0)
    )
    return s.select(
        "l_suppkey",
        "trade_date",
        (
            F.sum(F.col("close_px").cast("decimal(27,2)")).over(w7).cast("double")
            / F.count("close_px").over(w7)
        ).alias("avg_close_7d"),
        F.count("close_px").over(w7).alias("n_obs_7d"),
    )


# --- [extension] calendar spine + forward fill (LOCF) ------------------------
def forward_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free daily panel: cross-join the distinct trading calendar with
    the supplier dimension, left-join the observed series, then carry the
    last observation forward (``last(..., ignorenulls)`` over an unbounded
    preceding frame). The spine sides are tiny (dates x suppliers) and both
    broadcast; the fill itself reuses the per-supplier shuffle. This is the
    standard as-of densification step before any fixed-frequency model
    (the reference's notebooks silently assume a dense panel). [extension]"""
    s = supplier_daily_ohlcv(spark, sf_dir)
    dates = s.select("trade_date").distinct()
    keys = s.select("l_suppkey").distinct()
    spine = keys.crossJoin(F.broadcast(dates))
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("trade_date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(s.select("l_suppkey", "trade_date", "close_px"),
                   ["l_suppkey", "trade_date"], "left")
        .select(
            "l_suppkey",
            "trade_date",
            (F.col("close_px").isNotNull()).alias("observed"),
            F.last("close_px", ignorenulls=True).over(w).alias("close_filled"),
        )
    )


# --- [extension] calendar spine + linear interpolation -----------------------
def interpolate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free daily panel with LINEAR interpolation between the bracketing
    observations (pandas `interpolate(method='time')` at warehouse scale) —
    the companion to forward_fill_daily's LOCF. Same spine + one
    per-supplier shuffle; the interpolant is computed as an exact integer
    rational (cents·day-weights, one closing binary64 division), so the
    filled values are bit-identical across engines. NULL outside the first/
    last observation (nothing to bracket)."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    dates = s.select("trade_date").distinct()
    keys = s.select("l_suppkey").distinct()
    spine = keys.crossJoin(F.broadcast(dates))
    obs = s.select(
        "l_suppkey",
        "trade_date",
        F.expr("CAST(round(close_px * 100) AS BIGINT)").alias("cents"),
    )
    j = spine.join(obs, ["l_suppkey", "trade_date"], "left")
    d = F.unix_date("trade_date")
    wb = (
        Window.partitionBy("l_suppkey")
        .orderBy("trade_date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # The NEXT-observation lookup is a running last() over DESCENDING date,
    # not first() over a [current, unboundedFollowing) frame: Spark executes
    # an UnboundedFollowing frame by re-scanning the remainder of the
    # partition for EVERY row — O(rows²) per supplier, and measured at
    # ~200 s on the sf0.1 panel when AQE coalesced the spine to few
    # partitions (PERFORMANCE.md scale study). The reversed running frame
    # computes the identical value (first non-null at-or-after a date ==
    # last non-null seen scanning dates downward) in O(rows), one extra
    # local sort, same single exchange.
    wf = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.desc("trade_date"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_d = F.when(F.col("cents").isNotNull(), d)
    prev_c = F.last("cents", ignorenulls=True).over(wb)
    prev_d = F.last(obs_d, ignorenulls=True).over(wb)
    next_c = F.last("cents", ignorenulls=True).over(wf)
    next_d = F.last(obs_d, ignorenulls=True).over(wf)
    num = prev_c * (next_d - d) + next_c * (d - prev_d)
    interp = F.when(
        F.col("cents").isNotNull(), F.col("cents") / 100.0
    ).otherwise(num / ((next_d - prev_d) * F.lit(100.0)))
    return j.select(
        "l_suppkey",
        "trade_date",
        F.col("cents").isNotNull().alias("observed"),
        interp.alias("close_interp"),
    )


# --- [extension] sessionization ---------------------------------------------
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: new session when the per-user gap > 30 min.
    lag + boolean cumsum — one shuffle on user_id, then pure window ops."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (unix_timestamp truncates seconds and would
    # disagree with the oracle at window boundaries)
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts", 1).over(w))
    with_sess = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dec_sum("value").alias(
            "session_value"
        ),
    )


def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN session_window aggregation in batch mode (the engine
    twin of streaming_session_window, and the declarative counterpart of
    sessionize_events' manual lag+cumsum): Spark merges per-user event
    windows with a 30-min inactivity gap inside one hash aggregate —
    window.end is last-event + gap by definition. Same single shuffle on
    user_id as the manual form, no window-function sort pass."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw.alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_close"),
            "n_events",
            "session_value",
        )
    )


def scd2_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing history of each user's event_type attribute:
    consecutive duplicates collapse (run-length compression of the ordered
    stream) and each surviving row carries [valid_from, valid_to) — the
    standard SCD2 dimension-build, done with two window passes over one
    user_id shuffle: lag() marks change points, lead() after the filter
    closes each validity interval (open interval = NULL valid_to). Ordering
    is total (ts, event_id) so ties can't flip rows between engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = ev.withColumn(
        "prev_type", F.lag("event_type").over(w)
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changed.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )


def scd2_daily_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-table (point-in-time) join: the SCD2 dimension snapshotted
    at the end of every calendar day per user — 'what was each user's
    attribute version as of day D' — the query every warehouse asks of an
    SCD2 dimension and the composition that closes the loop on
    scd2_event_history. Snapshot instant = start of the next day (half-open
    interval test valid_from < D+1 ≤ valid_to), which matches exactly one
    interval per (user, day) because the intervals partition the user's
    active range. Scale: the dim side is run-length-compressed (few
    intervals per user), the day spine is |users|·|days| — the join is a
    per-user equi-join with a tiny interval filter, never fact×fact; the
    corpus-max day is a 1-row broadcast."""
    dim = scd2_event_history(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.max(F.to_date("ts")).alias("max_day"))
    user_start = dim.groupBy("user_id").agg(
        F.min("valid_from").alias("first_ts")
    )
    spine = user_start.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(
            F.sequence(F.to_date("first_ts"), F.col("max_day"))
        ).alias("day"),
    )
    day_end = F.col("day").cast("timestamp") + F.expr("INTERVAL 1 DAY")
    return (
        spine.join(dim, "user_id")
        .filter(
            (F.col("valid_from") < day_end)
            & (F.col("valid_to").isNull() | (F.col("valid_to") >= day_end))
        )
        .select(
            "user_id",
            "day",
            F.col("event_type").alias("attr_event_type"),
            "valid_from",
        )
    )


QUERIES = {
    "lead_target": lead_target,
    "scd2_event_history": scd2_event_history,
    "scd2_daily_snapshot": scd2_daily_snapshot,
    "lag_features": lag_features,
    "pct_change": pct_change,
    "rolling_mean": rolling_mean,
    "rolling_median_5row": rolling_median_5row,
    "rolling_mean_7d_range": rolling_mean_7d_range,
    "forward_fill_daily": forward_fill_daily,
    "interpolate_daily": interpolate_daily,
    "direction_sign": direction_sign,
    "sequence_assembly": sequence_assembly,
    "daily_event_activity": daily_event_activity,
    "latest_per_group": latest_per_group,
    "rank_orders": rank_orders,
    "topk_per_group": topk_per_group,
    "running_total": running_total,
    "sessionize_events": sessionize_events,
    "session_window_batch": session_window_batch,
}

ORACLE = {
    "scd2_event_history": """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM changes
""",
    "scd2_daily_snapshot": """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE prev_type IS NULL OR event_type <> prev_type
), scd2 AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changes
), bounds AS (
  SELECT max(CAST(ts AS DATE)) AS max_day FROM events
), user_start AS (
  SELECT user_id, CAST(min(valid_from) AS DATE) AS first_day
  FROM scd2 GROUP BY user_id
), spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(first_day AS TIMESTAMP),
                                     CAST(max_day AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM user_start CROSS JOIN bounds
)
SELECT s.user_id, s.day, d.event_type AS attr_event_type, d.valid_from
FROM spine s JOIN scd2 d ON s.user_id = d.user_id
WHERE d.valid_from < CAST(s.day AS TIMESTAMP) + INTERVAL 1 DAY
  AND (d.valid_to IS NULL
       OR d.valid_to >= CAST(s.day AS TIMESTAMP) + INTERVAL 1 DAY)
""",
    "lead_target": _stock_cte("""
SELECT l_suppkey, trade_date, close_px,
       lead(close_px, 1) OVER w AS close_next,
       CASE WHEN lead(close_px, 1) OVER w > close_px THEN 1
            WHEN lead(close_px, 1) OVER w IS NULL THEN NULL
            ELSE 0 END AS direction
FROM stock WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date)
"""),
    "lag_features": _stock_cte("""
SELECT l_suppkey, trade_date, close_px,
       lag(close_px, 1) OVER w AS prev_close,
       lag(volume, 1) OVER w AS prev_volume,
       lag(high_px, 2) OVER w AS high_2d_ago
FROM stock WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date)
"""),
    "pct_change": _stock_cte("""
SELECT l_suppkey, trade_date,
       round(close_px / lag(close_px, 1) OVER w - 1, 6) + 0.0 AS ret,
       round(lead(close_px, 1) OVER w / close_px - 1, 6) + 0.0 AS next_ret,
       round((close_px - open_px) / open_px, 6) + 0.0 AS intraday_ret
FROM stock WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date)
"""),
    "rolling_mean": _stock_cte("""
SELECT l_suppkey, trade_date,
       CAST(sum(CAST(close_px AS DECIMAL(27,2))) OVER w3 AS DOUBLE)
         / count(close_px) OVER w3 AS rolling_avg_close,
       sum(volume) OVER w3 / count(volume) OVER w3 AS rolling_avg_volume
FROM stock WINDOW w3 AS (PARTITION BY l_suppkey ORDER BY trade_date
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""),
    "rolling_median_5row": _stock_cte("""
SELECT l_suppkey, trade_date,
       CAST(len(s) AS INTEGER) AS n_obs,
       CAST(s[(len(s) + 1) // 2] + s[len(s) // 2 + 1] AS DOUBLE) / 200.0
         AS rolling_median_close
FROM (
  SELECT l_suppkey, trade_date,
         list_sort(list(CAST(round(close_px * 100) AS BIGINT)) OVER w5) AS s
  FROM stock
  WINDOW w5 AS (PARTITION BY l_suppkey ORDER BY trade_date
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
"""),
    "rolling_mean_7d_range": _stock_cte("""
SELECT l_suppkey, trade_date,
       CAST(sum(CAST(close_px AS DECIMAL(27,2))) OVER w7 AS DOUBLE)
         / count(close_px) OVER w7 AS avg_close_7d,
       count(close_px) OVER w7 AS n_obs_7d
FROM (SELECT *, datediff('day', DATE '1970-01-01', trade_date) AS day_num FROM stock)
WINDOW w7 AS (PARTITION BY l_suppkey ORDER BY day_num
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""),
    "forward_fill_daily": _stock_cte("""
SELECT k.l_suppkey, d.trade_date,
       s.close_px IS NOT NULL AS observed,
       last_value(s.close_px IGNORE NULLS)
         OVER (PARTITION BY k.l_suppkey ORDER BY d.trade_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled
FROM (SELECT DISTINCT l_suppkey FROM stock) k
CROSS JOIN (SELECT DISTINCT trade_date FROM stock) d
LEFT JOIN stock s ON s.l_suppkey = k.l_suppkey AND s.trade_date = d.trade_date
"""),
    "interpolate_daily": _stock_cte("""
SELECT l_suppkey, trade_date, cents IS NOT NULL AS observed,
       CASE WHEN cents IS NOT NULL THEN cents / 100.0
            ELSE (prev_c * (next_d - dnum) + next_c * (dnum - prev_d))
                 / ((next_d - prev_d) * 100.0)
       END AS close_interp
FROM (
  SELECT l_suppkey, trade_date, cents, dnum,
         last_value(cents IGNORE NULLS) OVER wb AS prev_c,
         last_value(CASE WHEN cents IS NOT NULL THEN dnum END IGNORE NULLS)
           OVER wb AS prev_d,
         first_value(cents IGNORE NULLS) OVER wf AS next_c,
         first_value(CASE WHEN cents IS NOT NULL THEN dnum END IGNORE NULLS)
           OVER wf AS next_d
  FROM (
    SELECT k.l_suppkey, d.trade_date,
           CAST(round(s.close_px * 100) AS BIGINT) AS cents,
           CAST(d.trade_date - DATE '1970-01-01' AS BIGINT) AS dnum
    FROM (SELECT DISTINCT l_suppkey FROM stock) k
    CROSS JOIN (SELECT DISTINCT trade_date FROM stock) d
    LEFT JOIN stock s
      ON s.l_suppkey = k.l_suppkey AND s.trade_date = d.trade_date
  )
  WINDOW wb AS (PARTITION BY l_suppkey ORDER BY trade_date
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY l_suppkey ORDER BY trade_date
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
"""),
    "direction_sign": _stock_cte("""
SELECT l_suppkey, trade_date,
       CAST(sign(close_px - lag(close_px, 1) OVER w) AS INTEGER) AS direction
FROM stock WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date)
"""),
    "sequence_assembly": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
seqs AS (
  SELECT l_suppkey, trade_date,
         list(CAST(round(close_px * 100) AS BIGINT))
           OVER (PARTITION BY l_suppkey ORDER BY trade_date
                 ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS cents
  FROM stock
)
SELECT l_suppkey, trade_date,
       array_to_string(cents, '|') AS seq_cents,
       CAST(len(cents) AS INTEGER) AS seq_len,
       CAST(list_sum(cents) AS DOUBLE) / 100.0 AS seq_sum
FROM seqs WHERE len(cents) = 5
""",
    "daily_event_activity": """
SELECT CAST(ts AS DATE) AS day, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS day_value
FROM events GROUP BY 1
""",
    "latest_per_group": _stock_cte("""
SELECT l_suppkey, trade_date, close_px FROM (
  SELECT l_suppkey, trade_date, close_px,
         row_number() OVER (PARTITION BY l_suppkey ORDER BY trade_date DESC) AS rn
  FROM stock
) WHERE rn = 1
"""),
    "rank_orders": """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(rank() OVER wp AS INTEGER) AS rnk,
       CAST(dense_rank() OVER wp AS INTEGER) AS drnk,
       CAST(ntile(4) OVER wd AS INTEGER) AS quartile
FROM orders
WINDOW wp AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC),
       wd AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
    "topk_per_group": """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
""",
    "running_total": _stock_cte("""
SELECT l_suppkey, trade_date,
       sum(volume) OVER (PARTITION BY l_suppkey ORDER BY trade_date
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS cum_volume
FROM stock
"""),
    "sessionize_events": """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS session_value
FROM s GROUP BY user_id, session_id
""",
    # same gap-islands; session_window's end = last event + the 30-min gap
    "session_window_batch": """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_close,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS session_value
FROM s GROUP BY user_id, session_id
""",
}


SUPPRESS_DAYS = 7  # cooldown: a kept row blocks the key for this many days


def suppression_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cooldown dedup: per customer, keep an order only if ≥ SUPPRESS_DAYS
    have passed since the LAST KEPT order (first order always kept; ties
    on a day broken by o_orderkey). [extension]

    This is the alert-throttling / retraining-trigger / near-dup
    suppression-window primitive. It is genuinely NOT window-expressible:
    whether a row is kept depends on which earlier rows were KEPT, not
    just on the raw predecessor (a lag() would reset the cooldown on
    suppressed rows too). The reference-class escape hatch applies
    (SURVEY §2.11 custom-operator ladder, step b): applyInPandas per key —
    parallel across customers, one linear Arrow-batched pass per group,
    state bounded by one date. At 100 TB the cost profile is one shuffle
    on the entity key then map-side sequential scans, the same shape as
    sessionization.

    Oracle: DuckDB recursive CTE advancing (rn → rn+1) per key carries the
    last-kept date through the recursion — exact date arithmetic, so the
    kept set is value-level checkable."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("day"),
    )

    def keep_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["day", "o_orderkey"], kind="mergesort")
        kept_idx = []
        last_kept = None
        for row in pdf.itertuples():
            d = row.day
            if last_kept is None or (d - last_kept).days >= SUPPRESS_DAYS:
                kept_idx.append(row.Index)
                last_kept = d
        return pdf.loc[kept_idx, ["o_custkey", "o_orderkey", "day"]]

    out_schema = "o_custkey long, o_orderkey long, day date"
    # Pin the Arrow-UDF stage's parallelism: AQE coalesces shuffle output by
    # BYTE size, but a per-group Python pass is CPU-bound per row — at sf0.1
    # AQE folded ~15k customer groups into 2 partitions and serialized 24 s
    # of Python onto 2 cores. An explicit repartition(N, key) produces the
    # exact hashpartitioning applyInPandas requires (no extra exchange) and
    # AQE does not coalesce user-specified partition counts. Values are
    # partitioning-independent (per-group computation).
    n = spark.sparkContext.defaultParallelism
    return (
        o.repartition(n, "o_custkey")
        .groupBy("o_custkey")
        .applyInPandas(keep_group, out_schema)
    )


QUERIES["suppression_window_dedup"] = suppression_window_dedup

ORACLE["suppression_window_dedup"] = f"""
WITH RECURSIVE seq AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS day,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
           AS rn
  FROM orders
), keep AS (
  SELECT o_custkey, o_orderkey, day, rn, day AS last_kept, TRUE AS kept
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.o_custkey, s.o_orderkey, s.day, s.rn,
         CASE WHEN s.day >= k.last_kept + {SUPPRESS_DAYS}
              THEN s.day ELSE k.last_kept END,
         s.day >= k.last_kept + {SUPPRESS_DAYS}
  FROM keep k JOIN seq s ON s.o_custkey = k.o_custkey AND s.rn = k.rn + 1
)
SELECT o_custkey, o_orderkey, day FROM keep WHERE kept
"""


SEASON_LAG = 7  # seasonal-naive horizon, in trading observations
MAD_K = 3  # outlier threshold: |resid| > MAD_K · MAD


def seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly detection on the close series: residual =
    cents − cents SEASON_LAG trading observations ago, robust scale = the
    per-supplier MAD (lower-median of |residual|, an exact integer order
    statistic), flag = |residual| > MAD_K·MAD. The standard
    forecast-residual outlier pass a monitoring pipeline runs — entirely
    in integers: the median is rank selection (never interpolation), the
    threshold an integer cross-multiplication (never a division), so
    every value is bit-portable by construction.

    Scale shape: one hashpartitioning(l_suppkey) exchange feeds the lag
    window, the MAD rank window, and the count window; no join, no
    global sort, constant state per row. [extension]"""
    s = supplier_daily_ohlcv(spark, sf_dir)
    cents = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    base = s.select("l_suppkey", "trade_date", cents.alias("c"))
    resid = (F.col("c") - F.lag("c", SEASON_LAG).over(_w())).alias("resid")
    r = base.select("l_suppkey", "trade_date", resid).filter(
        F.col("resid").isNotNull()
    )
    wmad = Window.partitionBy("l_suppkey").orderBy(
        F.abs("resid"), "trade_date"
    )
    wall = Window.partitionBy("l_suppkey")
    ranked = (
        r.withColumn("rn", F.row_number().over(wmad))
        .withColumn("np", F.count("*").over(wall))
    )
    mad = ranked.filter(F.col("rn") == F.expr("(np + 1) DIV 2")).select(
        "l_suppkey", F.abs("resid").alias("mad")
    )
    return (
        r.join(mad, "l_suppkey")
        .select(
            "l_suppkey",
            "trade_date",
            "resid",
            "mad",
            (F.abs("resid") > F.lit(MAD_K) * F.col("mad")).alias(
                "is_outlier"
            ),
        )
    )


QUERIES["seasonal_residual_outliers"] = seasonal_residual_outliers

ORACLE["seasonal_residual_outliers"] = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
resids AS (
  SELECT l_suppkey, trade_date,
         CAST(round(close_px * 100) AS BIGINT)
           - lag(CAST(round(close_px * 100) AS BIGINT), {SEASON_LAG})
             OVER (PARTITION BY l_suppkey ORDER BY trade_date) AS resid
  FROM stock
), rr AS (
  SELECT l_suppkey, trade_date, resid FROM resids WHERE resid IS NOT NULL
), mads AS (
  SELECT l_suppkey, abs(resid) AS mad FROM (
    SELECT l_suppkey, resid,
           row_number() OVER (PARTITION BY l_suppkey
                              ORDER BY abs(resid), trade_date) AS rn,
           count(*) OVER (PARTITION BY l_suppkey) AS np
    FROM rr
  ) WHERE rn = (np + 1) // 2
)
SELECT r.l_suppkey, r.trade_date, r.resid, m.mad,
       abs(r.resid) > {MAD_K} * m.mad AS is_outlier
FROM rr r JOIN mads m USING (l_suppkey)
"""


EWMA_SPAN = 10  # terms in the truncated EWM window


def ewma_dyadic_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the close, α = 1/2,
    truncated to the trailing EWMA_SPAN observations:
    ewma_t = Σ_{j=0..n−1} c_{t−j}·2^{−(j+1)}, renormalized by the
    truncated weight mass (1 − 2^{−n}).

    A float EWMA is normally the canonical NON-oracle-checkable surface
    (recursive float state merges differently everywhere). α = 1/2 makes
    it exact: every weight is a power of two, scaling a binary64 by 2^−k
    never rounds, and the sum of n ≤ 10 terms spans ≤ 27+10 significand
    bits < 53 — so every intermediate is an exact dyadic rational and
    the result is bit-identical under ANY evaluation order, on both
    engines. The final renormalization is one shared binary64 division
    of two exact values. (The same idiom as exact_price_quantiles'
    dyadic interpolation.)

    Shape: one suppkey exchange; the frame is EWMA_SPAN rows, constant
    state per row; the weighted fold is a per-row array expression over
    the collected frame — no UDF, no recursion. [extension]"""
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = _w().rowsBetween(-(EWMA_SPAN - 1), 0)
    cents = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    # frame collected oldest→newest (orderBy trade_date), so element i of
    # n gets weight 2^{-(n-i)} — newest (i = n) weighs 2^{-1}
    arr = F.collect_list(cents).over(w)
    base = s.select("l_suppkey", "trade_date", arr.alias("cs"))
    n = F.size("cs")
    weighted = F.aggregate(
        F.zip_with(
            F.col("cs"),
            F.sequence(F.lit(1), n),
            lambda c, i: c.cast("double")
            * F.pow(F.lit(2.0), (i - n.cast("int") - 1).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    mass = F.lit(1.0) - F.pow(F.lit(2.0), -n.cast("double"))
    return base.select(
        "l_suppkey",
        "trade_date",
        n.alias("n_obs"),
        (weighted / mass / F.lit(100.0)).alias("ewma_close"),
    )


QUERIES["ewma_dyadic_close"] = ewma_dyadic_close

ORACLE["ewma_dyadic_close"] = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
frames AS (
  SELECT l_suppkey, trade_date,
         list(CAST(round(close_px * 100) AS BIGINT))
           OVER (PARTITION BY l_suppkey ORDER BY trade_date
                 ROWS BETWEEN {EWMA_SPAN} - 1 PRECEDING AND CURRENT ROW)
           AS cs
  FROM stock
)
SELECT l_suppkey, trade_date,
       CAST(len(cs) AS INTEGER) AS n_obs,
       list_sum(list_transform(list_zip(cs, range(1, len(cs) + 1)),
                p -> p[1]::DOUBLE * pow(2.0, p[2] - len(cs) - 1)))
         / (1.0 - pow(2.0, -len(cs))) / 100.0 AS ewma_close
FROM frames
"""
