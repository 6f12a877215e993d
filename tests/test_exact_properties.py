"""Property-based tests (hypothesis) for the exact-aggregation helpers that
back every float oracle — SURVEY §5.2(5). These pin the determinism
machinery itself: if dec_sum/big_sum ever lose exactness, dozens of oracle
checks would start failing only at data volumes where the sums cross a
rounding boundary; here hypothesis hunts those boundaries directly on
adversarial inputs.
"""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from stockmarket_bigdata_project_spark.functions.exact import big_sum, dec_sum
from stockmarket_bigdata_project_spark.llmdata.decontam import _word_ngrams

# one shared, bounded profile: each example runs a tiny Spark job
_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# 2-decimal money values as exact cents → float is the parquet-ish input
cents = st.integers(min_value=-10_000_000, max_value=10_000_000)


@given(st.lists(cents, min_size=1, max_size=30))
@_SETTINGS
def test_dec_sum_is_exact_over_2dec_inputs(spark, values):
    """dec_sum of 2-decimal doubles equals the exact rational total rendered
    to binary64 — independent of row order/partitioning."""
    doubles = [c / 100.0 for c in values]
    df = spark.createDataFrame([(v,) for v in doubles], "x double")
    got = df.agg(dec_sum("x").alias("s")).collect()[0].s
    # exact rational → nearest double, via Fraction so the expectation itself
    # has no intermediate float rounding (int/int division is correctly
    # rounded in Python)
    frac = sum(Fraction(c, 100) for c in values)
    exact = frac.numerator / frac.denominator
    assert got == exact, (values, got, exact)


big_ints = st.integers(min_value=-(10**22), max_value=10**22)


@given(st.lists(big_ints, min_size=1, max_size=25))
@_SETTINGS
def test_big_sum_matches_correctly_rounded_python(spark, values):
    """big_sum (decimal-string route) must equal Python's correctly-rounded
    int→float conversion of the exact integer total — including far past
    2^53 where naive decimal→double casts go off by an ulp."""
    df = spark.createDataFrame([(Decimal(v),) for v in values], "x decimal(38,0)")
    got = df.agg(big_sum(F.col("x")).alias("s")).collect()[0].s
    assert got == float(sum(values)), (values, got, float(sum(values)))


words = st.lists(
    st.sampled_from(["a", "bb", "ccc", "data", "x", "yy"]), min_size=0, max_size=12
)


@given(words, st.integers(min_value=2, max_value=5))
@_SETTINGS
def test_word_ngrams_matches_python_reference(spark, ws, n):
    """_word_ngrams == the set of distinct space-joined n-grams, for any doc
    length including the shorter-than-n edge."""
    text = " ".join(ws)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r.gram for r in _word_ngrams(df, n).collect()}
    toks = text.split(" ")  # split semantics: "" → [""], like Spark's
    expect = {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    } if len(toks) >= n else set()
    assert got == expect, (text, n, got, expect)
