"""ML-adjacent dataflow operators (SURVEY §2.10): scaling, sequential splits,
vectorized model inference, evaluation metrics, prediction-document assembly.

Model *fitting* stays outside the engine (as in the reference — sklearn/XGBoost
notebooks); everything data-shaped is Spark:

  M3 scaler fit+transform      01_preprocess.ipynb cell 6 — agg stats + projection
  M4 sequential split          02_..ipynb cell 3 (shuffle=False 70%) — row_number/count
  M5 per-row inference         stock_pipeline.py:218-219 — pandas_udf (Arrow), the
                               engine's replacement for the reference's driver loop;
                               deterministic linear model so the oracle can replicate
  M6 evaluation                stock_pipeline.py:233-237; app.py:410-416 — aggregates
  M8 prediction documents      stock_pipeline.py:227-253 — nested struct assembly
  quirk: prediction_pct_error compares predicted NEXT-day price to CURRENT close
         (stock_pipeline.py:233-237; SURVEY §7.3-8) — reproduced as-is.
  quirk: confidence = greatest(0.5, 1 − |err|/actual) (deterministic notebook form,
         06_XGBoost_model.ipynb cell 11; the streaming uniform(0.6,0.9) variant is
         not oracle-checkable and is omitted, SURVEY §7.3-4).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import pandas_udf

from .catalog import load_table
from .operators.gold import SUPPLIER_DAILY_SQL, supplier_daily_ohlcv

_W = lambda: Window.partitionBy("l_suppkey").orderBy("trade_date")  # noqa: E731
_WP = lambda: Window.partitionBy("l_suppkey")  # noqa: E731


# --- M3: standard + minmax scaling ------------------------------------------
def scale_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaler 'fit' = per-key agg stats; 'transform' = projection. One shuffle."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    # Partition-only windows have no defined row order, so built-in
    # avg/stddev over the unordered buffer are not run-to-run stable. Exact
    # decimal window sums of the 2-decimal close (and its 4-decimal square)
    # + binary64 algebra are order-independent; min/max are exact anyway.
    wp = _WP()
    cents = F.expr("CAST(round(close_px * 100) AS BIGINT)")
    s1 = F.sum(cents).over(wp).cast("double") / 100.0
    s2 = F.sum(cents * cents).over(wp).cast("double") / 10000.0
    nv = F.count("close_px").over(wp)
    mean_c = s1 / nv
    std_c = F.sqrt(
        (s2 - s1 * s1 / nv) / F.nullif((nv - 1).cast("double"), F.lit(0.0))
    )
    min_v = F.min("volume").over(wp)
    max_v = F.max("volume").over(wp)
    return s.select(
        "l_suppkey",
        "trade_date",
        ((F.col("close_px") - mean_c) / std_c).alias("close_z"),
        ((F.col("volume") - min_v) / (max_v - min_v)).alias("volume_mm"),
    )


# --- M4: sequential (no-shuffle) train/test split ---------------------------
def sequential_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    rn = F.row_number().over(_W())
    n = F.count("*").over(_WP())
    return s.select(
        "l_suppkey",
        "trade_date",
        F.when(rn <= F.floor(n * 0.7), "train").otherwise("test").alias("split"),
    )


def timeseries_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding-window cross-validation assignment — the set-based twin of
    sklearn's ``TimeSeriesSplit(5)`` the reference fits inside
    (05_Linear_regression_model.ipynb cell 6, SURVEY §2.10 M4): each series
    is cut into 6 equal chronological chunks; fold f (1..5) trains on chunks
    0..f-1 and tests on chunk f, so train always precedes test.

    One row per (observation, fold) membership. chunk = ((rn-1)*6) div n is
    pure integer arithmetic — identical in every engine — and the fold
    fan-out is a map-side ``explode(sequence(...))``, so the whole operator
    costs the one per-key window shuffle every other time-series op reuses."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    ranked = s.select(
        "l_suppkey",
        "trade_date",
        F.row_number().over(_W()).alias("rn"),
        F.count("*").over(_WP()).alias("n"),
    ).select(
        "l_suppkey",
        "trade_date",
        F.expr("((rn - 1) * 6) div n").cast("int").alias("chunk"),
    )
    return (
        ranked.select(
            "l_suppkey",
            "trade_date",
            "chunk",
            F.explode(F.sequence(F.lit(1), F.lit(5))).alias("fold"),
        )
        .filter(F.col("chunk") <= F.col("fold"))
        .select(
            "l_suppkey",
            "trade_date",
            "fold",
            F.when(F.col("chunk") == F.col("fold"), "test")
            .otherwise("train")
            .alias("role"),
        )
    )


# --- M5: vectorized inference (deterministic linear model) ------------------
# fixed coefficients — a stand-in for a trained model; linear so DuckDB can
# replicate the arithmetic exactly
_COEF_PREV_RET = 0.3
_COEF_MOMENTUM = -0.1
_INTERCEPT = 0.001


class _FixedLinearModel:
    """The deterministic stand-in model, shaped like the sklearn predict
    API (an (n, 2) feature matrix in, an (n,) prediction vector out) so a
    pickled LinearRegression/XGBRegressor drops into the same slot —
    reference stock_pipeline.py:218 calls exactly model.predict(features).
    """

    def predict(self, X):
        return _COEF_PREV_RET * X[:, 0] + _COEF_MOMENTUM * X[:, 1] + _INTERCEPT


def predict_udf(model=None):
    """Arrow-batched inference around ANY object with a .predict(ndarray)
    method (sklearn, XGBoost, a pickle loaded per executor): one Python
    call per Arrow batch, not per row. Built lazily: pandas_udf type
    resolution needs an active SparkSession. Default model is the fixed
    linear stand-in, which keeps the query DuckDB-replicable."""
    import numpy as np

    mdl = model if model is not None else _FixedLinearModel()

    @pandas_udf("double")
    def _predict(prev_ret: pd.Series, momentum: pd.Series) -> pd.Series:
        X = np.column_stack([prev_ret.to_numpy(), momentum.to_numpy()])
        return pd.Series(np.asarray(mdl.predict(X), dtype="float64"))

    return _predict


def _linear_predict_udf():
    return predict_udf()


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = _W()
    prev = F.lag("close_px", 1).over(w)
    roll3 = F.avg("close_px").over(w.rowsBetween(-2, 0))
    return s.select(
        "l_suppkey",
        "trade_date",
        "close_px",
        "volume",
        (F.col("close_px") / prev - 1).alias("prev_ret"),
        (F.col("close_px") / roll3 - 1).alias("momentum"),
    ).na.drop(subset=["prev_ret"])


def _q(col: "F.Column", scale: float) -> "F.Column":
    """Engine-portable fixed-point quantizer for a genuine-real double:
    floor(x·10^s + 0.5) / 10^s. Every step is a correctly-rounded IEEE-754
    op on identical inputs, so Spark and DuckDB agree bit-for-bit —
    unlike round(x, s), whose algorithm differs per engine (Spark rounds
    the shortest-repr decimal HALF_UP, DuckDB rounds after a float
    multiply; they disagree at half boundaries — playbook rule 2, banned)."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("double") / F.lit(
        scale
    )


def predict_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _features(spark, sf_dir)
    pred = _linear_predict_udf()(F.col("prev_ret"), F.col("momentum"))
    return f.select(
        "l_suppkey",
        "trade_date",
        "close_px",
        _q(pred, 1e6).alias("pred_return"),
        _q(F.col("close_px") * (1 + pred), 1e4).alias("predicted_price"),
    )


# --- M6: evaluation metrics --------------------------------------------------
def eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE / RMSE / MAPE / direction accuracy of the naive previous-close
    forecast, per key (direction accuracy = app.py:411-415 semantics)."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = _W()
    pred = F.lag("close_px", 1).over(w)  # naive forecast
    prev2 = F.lag("close_px", 2).over(w)
    base = s.select(
        "l_suppkey",
        "close_px",
        pred.alias("pred"),
        (F.col("close_px") - pred).alias("err"),
        F.signum(F.col("close_px") - pred).alias("dir_actual"),
        F.signum(pred - prev2).alias("dir_pred"),
    ).na.drop(subset=["pred"])
    # |err| is a 2-decimal magnitude (difference of 2-decimal closes): the
    # DECIMAL(27,6) quantization recovers it exactly; err^2 is 4-decimal →
    # scale 8; |err/close| is a genuine real → scale 12 is a deterministic
    # per-row rounding, identical on both engines. Sums then exact; the
    # closing divisions/sqrt are pure binary64.
    n_err = F.count("err")
    return base.groupBy("l_suppkey").agg(
        (
            F.sum(F.abs("err").cast("decimal(27,6)")).cast("double") / n_err
        ).alias("mae"),
        # err^2 in integer square-cents: a DECIMAL(27,8) sum here exceeds
        # 2^53 in raw scaled units, where DuckDB's decimal->double cast
        # rounds differently than Spark's (observed 1-ulp rmse drift).
        # BIGINT sums convert correctly-rounded on both engines.
        F.sqrt(
            F.sum(
                F.expr("CAST(round(err * 100) AS BIGINT)")
                * F.expr("CAST(round(err * 100) AS BIGINT)")
            ).cast("double")
            / 10000.0
            / n_err
        ).alias("rmse"),
        # |err|/close is a ratio of exact cent integers: quantize it at 9dp
        # with pure BIGINT arithmetic (round-half-up on the rational), because
        # double->decimal casts of arbitrary reals round differently per
        # engine (DuckDB multiplies by 10^s in float first).
        (
            F.sum(
                F.expr(
                    "(abs(CAST(round(err * 100) AS BIGINT)) * 2000000000"
                    " + CAST(round(close_px * 100) AS BIGINT))"
                    " DIV (2 * CAST(round(close_px * 100) AS BIGINT))"
                )
            ).cast("double")
            / 1000000000.0
            / n_err
        ).alias("mape"),
        F.avg((F.col("dir_actual") == F.col("dir_pred")).cast("int")).alias(
            "direction_accuracy"
        ),
        F.count("*").alias("n"),
    )


def confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direction confusion matrix = groupBy(actual, predicted).count()."""
    s = supplier_daily_ohlcv(spark, sf_dir)
    w = _W()
    nxt = F.lead("close_px", 1).over(w)
    prev = F.lag("close_px", 1).over(w)
    base = s.select(
        (nxt > F.col("close_px")).cast("int").alias("dir_actual"),
        (F.col("close_px") > prev).cast("int").alias("dir_pred"),
    ).na.drop()
    return base.groupBy("dir_actual", "dir_pred").agg(F.count("*").alias("n"))


# --- M8 + FIXTURES §5: prediction-document assembly -------------------------
def prediction_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The predictions table (flat form — oracle-checked). Reproduces the
    reference's pct-error-vs-current-close quirk as-is."""
    p = predict_returns(spark, sf_dir)
    err = F.col("predicted_price") - F.col("close_px")
    return p.select(
        F.col("l_suppkey").alias("ticker"),
        F.col("trade_date").cast("timestamp").alias("timestamp"),
        F.date_add("trade_date", 1).cast("timestamp").alias("prediction_date"),
        "predicted_price",
        F.col("close_px").alias("actual_price"),
        _q(err, 1e4).alias("prediction_error"),
        _q(err / F.col("close_px") * 100, 1e6).alias("prediction_pct_error"),
        F.lit("linear_momentum_v1").alias("model_type"),
        _q(
            F.greatest(F.lit(0.5), 1 - F.abs(err / F.col("close_px"))), 1e6
        ).alias("confidence"),
    )


def prediction_documents_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct form (features_used struct — stock_pipeline.py:239-249).
    Rows-only check: struct value-hashing is driver-dependent."""
    f = _features(spark, sf_dir)
    pred = F.round(_linear_predict_udf()(F.col("prev_ret"), F.col("momentum")), 6)
    return f.select(
        F.col("l_suppkey").alias("ticker"),
        F.col("trade_date").cast("timestamp").alias("timestamp"),
        F.round(F.col("close_px") * (1 + pred), 4).alias("predicted_price"),
        F.struct(
            F.col("close_px").alias("close"),
            F.col("volume").alias("volume"),
            F.round("prev_ret", 6).alias("prev_ret"),
            F.round("momentum", 6).alias("momentum"),
        ).alias("features_used"),
        F.lit("linear_momentum_v1").alias("model_type"),
    )


def feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: feature-importance ranking (reference 02_train_baseline_model.ipynb
    cells 6-7 sort XGBoost importances desc, take the top features). For the
    deterministic linear stand-in model the scale-aware importance is
    |coef| x max|feature| over the data — max is order-free, the product one
    binary64 multiply, so the ranking is exactly oracle-checkable."""
    f = _features(spark, sf_dir)
    stats = f.agg(
        F.max(F.abs("prev_ret")).alias("m_prev"),
        F.max(F.abs("momentum")).alias("m_mom"),
    )
    imp = stats.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("prev_ret").alias("feature"),
                    (F.lit(abs(_COEF_PREV_RET)) * F.col("m_prev")).alias(
                        "importance"
                    ),
                ),
                F.struct(
                    F.lit("momentum").alias("feature"),
                    (F.lit(abs(_COEF_MOMENTUM)) * F.col("m_mom")).alias(
                        "importance"
                    ),
                ),
            )
        ).alias("fi")
    ).select("fi.feature", "fi.importance")
    w = Window.orderBy(F.desc("importance"), F.asc("feature"))
    return imp.select(
        "feature", "importance", F.row_number().over(w).alias("rank")
    )


def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the categorical event_type against
    value — the tabular-ML feature that replaces a category with the mean
    target of its OTHER members (plain mean-encoding leaks the row's own
    label; LOO is the standard fix). Exact arithmetic: per-category
    (cents-sum, count) from one aggregate, broadcast back onto the fact
    scan; each row's encoding is (S1 − x)/(n−1) — integer subtraction then
    one shared binary64 division, so the 'loo' values hash identically in
    both engines. Same plan shape as value_zscore_outliers: the fact table
    never shuffles. Singleton categories encode NULL (0/0)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    stats = ev.groupBy("event_type").agg(
        F.sum(cents).alias("s1"),
        F.count("value").alias("n"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    loo = F.when(
        F.col("n") > 1,
        (F.col("s1") - cents).cast("double")
        / (F.col("n") - 1)
        / F.lit(100.0),
    )
    return j.select("event_id", "event_type", "value", loo.alias("loo_mean_value"))


QUERIES = {
    "scale_features": scale_features,
    "sequential_split": sequential_split,
    "timeseries_cv_folds": timeseries_cv_folds,
    "predict_returns": predict_returns,
    "eval_metrics": eval_metrics,
    "feature_importance": feature_importance,
    "confusion_matrix": confusion_matrix,
    "prediction_documents": prediction_documents,
    "prediction_documents_nested": prediction_documents_nested,
    "target_encode_loo": target_encode_loo,
}

_FEATURES_SQL = f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
feat AS (
  SELECT l_suppkey, trade_date, close_px, volume,
         close_px / lag(close_px, 1) OVER w - 1 AS prev_ret,
         close_px / avg(close_px) OVER (PARTITION BY l_suppkey ORDER BY trade_date
                                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) - 1
           AS momentum
  FROM stock
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date)
)
SELECT * FROM feat WHERE prev_ret IS NOT NULL
"""

_PRED_SQL = f"""
WITH feat AS ({_FEATURES_SQL})
SELECT l_suppkey, trade_date, close_px,
       {_COEF_PREV_RET} * prev_ret + {_COEF_MOMENTUM} * momentum + {_INTERCEPT} AS pred
FROM feat
"""

ORACLE = {
    "scale_features": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL})
SELECT l_suppkey, trade_date,
       (close_px
        - CAST(sum(CAST(round(close_px * 100) AS BIGINT)) OVER wp AS DOUBLE) / 100.0
          / count(close_px) OVER wp)
       / sqrt((CAST(sum(CAST(round(close_px * 100) AS BIGINT)
                        * CAST(round(close_px * 100) AS BIGINT)) OVER wp AS DOUBLE) / 10000.0
               - (CAST(sum(CAST(round(close_px * 100) AS BIGINT)) OVER wp AS DOUBLE) / 100.0)
                 * (CAST(sum(CAST(round(close_px * 100) AS BIGINT)) OVER wp AS DOUBLE) / 100.0)
                 / count(close_px) OVER wp)
              / NULLIF(CAST(count(close_px) OVER wp - 1 AS DOUBLE), 0.0))
         AS close_z,
       (volume - min(volume) OVER wp)
         / (max(volume) OVER wp - min(volume) OVER wp) AS volume_mm
FROM stock WINDOW wp AS (PARTITION BY l_suppkey)
""",
    "sequential_split": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL})
SELECT l_suppkey, trade_date,
       CASE WHEN row_number() OVER (PARTITION BY l_suppkey ORDER BY trade_date)
                 <= floor(count(*) OVER (PARTITION BY l_suppkey) * 0.7)
            THEN 'train' ELSE 'test' END AS split
FROM stock
""",
    "timeseries_cv_folds": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
chunked AS (
  SELECT l_suppkey, trade_date,
         CAST(((row_number() OVER (PARTITION BY l_suppkey ORDER BY trade_date) - 1) * 6)
              // count(*) OVER (PARTITION BY l_suppkey) AS INTEGER) AS chunk
  FROM stock
)
SELECT l_suppkey, trade_date, CAST(f AS INTEGER) AS fold,
       CASE WHEN chunk = f THEN 'test' ELSE 'train' END AS role
FROM chunked, range(1, 6) t(f)
WHERE chunk <= f
""",
    "predict_returns": f"""
WITH p AS ({_PRED_SQL})
SELECT l_suppkey, trade_date, close_px,
       floor(pred * 1000000.0 + 0.5) / 1000000.0 AS pred_return,
       floor(close_px * (1 + pred) * 10000.0 + 0.5) / 10000.0
         AS predicted_price
FROM p
""",
    "feature_importance": f"""
WITH feat AS ({_FEATURES_SQL}),
stats AS (
  SELECT max(abs(prev_ret)) AS m_prev, max(abs(momentum)) AS m_mom FROM feat
),
fi AS (
  SELECT 'prev_ret' AS feature, {abs(_COEF_PREV_RET)} * m_prev AS importance FROM stats
  UNION ALL
  SELECT 'momentum' AS feature, {abs(_COEF_MOMENTUM)} * m_mom AS importance FROM stats
)
SELECT feature, importance,
       CAST(row_number() OVER (ORDER BY importance DESC, feature ASC) AS INTEGER) AS rank
FROM fi
""",
    "eval_metrics": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
base AS (
  SELECT l_suppkey, close_px,
         lag(close_px, 1) OVER w AS pred,
         close_px - lag(close_px, 1) OVER w AS err,
         sign(close_px - lag(close_px, 1) OVER w) AS dir_actual,
         sign(lag(close_px, 1) OVER w - lag(close_px, 2) OVER w) AS dir_pred
  FROM stock WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date)
)
SELECT l_suppkey,
       CAST(sum(CAST(abs(err) AS DECIMAL(27,6))) AS DOUBLE) / count(err) AS mae,
       sqrt(CAST(sum(CAST(round(err * 100) AS BIGINT)
                     * CAST(round(err * 100) AS BIGINT)) AS DOUBLE)
            / 10000.0 / count(err)) AS rmse,
       CAST(sum((abs(CAST(round(err * 100) AS BIGINT)) * 2000000000
                 + CAST(round(close_px * 100) AS BIGINT))
                // (2 * CAST(round(close_px * 100) AS BIGINT))) AS DOUBLE)
         / 1000000000.0 / count(err) AS mape,
       -- NULL dir_pred (2nd row/group) must stay NULL so avg() skips it,
       -- matching Spark's (NULL == x) → NULL semantics
       avg(CASE WHEN dir_pred IS NULL OR dir_actual IS NULL THEN NULL
                WHEN dir_actual = dir_pred THEN 1 ELSE 0 END)
         AS direction_accuracy,
       count(*) AS n
FROM base WHERE pred IS NOT NULL GROUP BY l_suppkey
""",
    "confusion_matrix": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
base AS (
  SELECT CASE WHEN lead(close_px, 1) OVER w > close_px THEN 1 ELSE 0 END AS dir_actual,
         CASE WHEN close_px > lag(close_px, 1) OVER w THEN 1 ELSE 0 END AS dir_pred,
         lead(close_px, 1) OVER w AS nxt, lag(close_px, 1) OVER w AS prv
  FROM stock WINDOW w AS (PARTITION BY l_suppkey ORDER BY trade_date)
)
SELECT dir_actual, dir_pred, count(*) AS n
FROM base WHERE nxt IS NOT NULL AND prv IS NOT NULL
GROUP BY dir_actual, dir_pred
""",
    "prediction_documents": f"""
WITH p AS ({_PRED_SQL}),
d AS (
  SELECT l_suppkey, trade_date, close_px,
         floor(close_px * (1 + pred) * 10000.0 + 0.5) / 10000.0
           AS predicted_price
  FROM p
)
SELECT l_suppkey AS ticker,
       CAST(trade_date AS TIMESTAMP) AS "timestamp",
       CAST(trade_date + 1 AS TIMESTAMP) AS prediction_date,
       predicted_price,
       close_px AS actual_price,
       floor((predicted_price - close_px) * 10000.0 + 0.5) / 10000.0
         AS prediction_error,
       floor((predicted_price - close_px) / close_px * 100 * 1000000.0 + 0.5)
         / 1000000.0 AS prediction_pct_error,
       'linear_momentum_v1' AS model_type,
       floor(greatest(0.5, 1 - abs((predicted_price - close_px) / close_px))
             * 1000000.0 + 0.5) / 1000000.0
         AS confidence
FROM d
""",
}

ORACLE["target_encode_loo"] = """
WITH stats AS (
  SELECT event_type,
         sum(CAST(round(value * 100) AS BIGINT)) AS s1,
         count(value) AS n
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       CASE WHEN n > 1 THEN
         CAST(s1 - CAST(round(value * 100) AS BIGINT) AS DOUBLE)
           / (n - 1) / 100.0
       END AS loo_mean_value
FROM events e JOIN stats s USING (event_type)
"""


# --- M6 extension: exact ROC AUC of the model score -------------------------
def direction_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ticker ROC AUC (Mann-Whitney U with midrank tie handling) of
    the fixed linear model's predicted return as a score for the next
    observed day's up-move — the threshold-free companion to
    eval_metrics' direction_accuracy (reference app.py:410-416 reports
    only the thresholded form; AUC is what a model comparison needs).

    Exactness: the score is the proven _q-quantized prediction (identical
    binary64 on both engines, so tie GROUPS are identical), and the AUC
    itself never touches a float — with per-score-group counts pos_g and
    neg_g and cum_neg_g = Σ neg over strictly-lower scores, the tie-aware
    numerator is 2U = Σ_g pos_g·(2·cum_neg_g + neg_g) (ties count half in
    U units), an integer, and AUC_micro = round-half-up(10⁶·2U / (2·n⁺n⁻))
    by cross-multiplication. Labels on the feature-filtered series (first
    row per key dropped by prev_ret, last by the lead) — both engines see
    the same series.

    Scale shape: the label lead reuses the per-key window partitioning the
    feature build already shuffled for; then one (key, score) hash
    aggregate, one window over the per-SCORE-GROUP relation (|groups| ≤
    |rows|, partition-local sort only), one per-key aggregate. No joins,
    no global sort. [extension]"""
    f = _features(spark, sf_dir)
    pred = _linear_predict_udf()(F.col("prev_ret"), F.col("momentum"))
    w = _W()
    scored = f.select(
        "l_suppkey",
        "trade_date",
        "close_px",
        _q(pred, 1e6).alias("score"),
    )
    nxt = F.lead("close_px", 1).over(w)
    labeled = scored.select(
        "l_suppkey",
        "score",
        (nxt > F.col("close_px")).cast("long").alias("label"),
    ).filter(F.col("label").isNotNull())
    grp = labeled.groupBy("l_suppkey", "score").agg(
        F.sum("label").alias("pos"),
        (F.count("*") - F.sum("label")).alias("neg"),
    )
    wsc = (
        Window.partitionBy("l_suppkey")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grp.select(
        "l_suppkey",
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(wsc), F.lit(0)).alias("cum_neg"),
    )
    per = cum.groupBy("l_suppkey").agg(
        F.sum(F.col("pos") * (2 * F.col("cum_neg") + F.col("neg"))).alias(
            "num2"
        ),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    return per.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        "l_suppkey",
        "n_pos",
        "n_neg",
        F.expr(
            "(2 * 1000000 * num2 + 2 * n_pos * n_neg)"
            " DIV (4 * n_pos * n_neg)"
        ).alias("auc_micro"),
    )


QUERIES["direction_auc"] = direction_auc

ORACLE["direction_auc"] = f"""
WITH p AS ({_PRED_SQL}),
scored AS (
  SELECT l_suppkey, trade_date, close_px,
         floor(pred * 1000000.0 + 0.5) / 1000000.0 AS score
  FROM p
), led AS (
  SELECT l_suppkey, score,
         lead(close_px, 1) OVER (PARTITION BY l_suppkey
                                 ORDER BY trade_date) AS nxt,
         close_px
  FROM scored
), lab AS (
  SELECT l_suppkey, score, CAST(nxt > close_px AS BIGINT) AS label
  FROM led WHERE nxt IS NOT NULL
), grp AS (
  SELECT l_suppkey, score,
         CAST(sum(label) AS BIGINT) AS pos,
         CAST(count(*) - sum(label) AS BIGINT) AS neg
  FROM lab GROUP BY l_suppkey, score
), cum AS (
  SELECT l_suppkey, pos, neg,
         COALESCE(CAST(sum(neg) OVER (
             PARTITION BY l_suppkey ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS BIGINT), 0) AS cum_neg
  FROM grp
), per AS (
  SELECT l_suppkey,
         CAST(sum(pos * (2 * cum_neg + neg)) AS BIGINT) AS num2,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(neg) AS BIGINT) AS n_neg
  FROM cum GROUP BY l_suppkey
)
SELECT l_suppkey, n_pos, n_neg,
       (2 * 1000000 * num2 + 2 * n_pos * n_neg)
         // (4 * n_pos * n_neg) AS auc_micro
FROM per WHERE n_pos > 0 AND n_neg > 0
"""
