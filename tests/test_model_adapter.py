"""M5 inference-surface adapter contract: the Arrow-batched predict_udf
accepts ANY object with the sklearn predict API (reference
stock_pipeline.py:218 runs exactly model.predict(features)), and a real
fitted model dropped into the slot reproduces the deterministic linear
twin. sklearn itself is not shipped in this sandbox, so the test uses it
when importable and otherwise a pickled numpy lookalike with the identical
predict contract — either way the surface exercised is 'externally trained
model object, serialized, evaluated batch-wise inside the engine'."""

from __future__ import annotations

import math
import pickle

import pyspark.sql.functions as F

from stockmarket_bigdata_project_spark.ml import (
    _COEF_MOMENTUM,
    _COEF_PREV_RET,
    _INTERCEPT,
    _features,
    predict_udf,
)


class _PickledLinear:
    """Module-level (hence picklable) numpy lookalike of a fitted sklearn
    LinearRegression — same attributes, same predict contract."""

    def __init__(self):
        import numpy as np

        self.coef_ = np.array([_COEF_PREV_RET, _COEF_MOMENTUM])
        self.intercept_ = _INTERCEPT

    def predict(self, X):
        return X @ self.coef_ + self.intercept_


def _make_model():
    try:
        import numpy as np
        from sklearn.linear_model import LinearRegression

        m = LinearRegression()
        # fit on a tiny synthetic design, then pin the exact coefficients —
        # the contract under test is the predict() slot, not the training
        m.fit(np.eye(2), np.zeros(2))
        m.coef_ = np.array([_COEF_PREV_RET, _COEF_MOMENTUM])
        m.intercept_ = _INTERCEPT
        return m
    except ImportError:
        return _PickledLinear()


def test_real_model_object_matches_deterministic_twin(spark, sf_dir):
    model = pickle.loads(pickle.dumps(_make_model()))  # the deploy path
    feats = _features(spark, sf_dir)
    twin = predict_udf()(F.col("prev_ret"), F.col("momentum"))
    ext = predict_udf(model)(F.col("prev_ret"), F.col("momentum"))
    rows = (
        feats.select(
            "l_suppkey",
            "trade_date",
            twin.alias("p_twin"),
            ext.alias("p_model"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # X @ coef vs a*x + b*y associate differently, so equality is
        # up to an ulp — anything looser would hide a wiring bug
        assert math.isclose(r.p_twin, r.p_model, rel_tol=1e-12, abs_tol=1e-15), r
