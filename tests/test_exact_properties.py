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


# tiny domains on BOTH axes force the edge cases the strict-domination rule
# exists for: price-level ties, date ties, full (price, date) duplicates
# across different orderkeys, and anticorrelated sets where the frontier is
# most of the input — the case the r11 join-free window rewrite must get
# right without the old broadcast semi-join's level table
_skyline_pts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # price level (cents)
        st.integers(min_value=0, max_value=9),  # day offset
    ),
    min_size=1,
    max_size=40,
)


@given(_skyline_pts)
@_SETTINGS
def test_skyline_window_frontier_matches_bruteforce(spark, pts):
    """The r11 window-only skyline (RANGE peer frame for the level max +
    RANGE 1-PRECEDING-under-DESC frame for the running higher-level max,
    two phases) vs brute-force O(n²) domination on adversarial tiny-domain
    inputs. Complements test_independent_oracles' fixed-data third opinion
    with hypothesis-driven tie/duplicate/anticorrelated shapes."""
    import datetime
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from stockmarket_bigdata_project_spark.operators.analytics import (
        skyline_two_phase_orders,
    )

    base = datetime.datetime(1996, 1, 1)
    rows = [
        (i + 1, 10.0 + c / 100.0, base + datetime.timedelta(days=d))
        for i, (c, d) in enumerate(pts)
    ]
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    d = tempfile.mkdtemp(prefix="skyline_prop_")
    pq_.write_table(tbl, os.path.join(d, "orders.parquet"))
    got = {
        (r.o_orderkey, r.cents, r.order_date)
        for r in skyline_two_phase_orders(spark, d).collect()
    }
    cds = [(k, round(p * 100), dt.date()) for k, p, dt in rows]
    expected = {
        (k, c, dd)
        for k, c, dd in cds
        if not any(
            c2 >= c and d2 >= dd and (c2 > c or d2 > dd) for _, c2, d2 in cds
        )
    }
    assert got == expected, (pts, got, expected)


def test_skyline_bucket_count_invariance(spark, sf_dir):
    """The phase-1 bucket count (r12: derived from defaultParallelism,
    no longer the fixed 32) must not change the frontier — local
    domination implies global domination for ANY deterministic
    bucketing, so 1 bucket (phase 1 IS the global pass), a prime
    bucket count, and the derived default all yield the same set."""
    from stockmarket_bigdata_project_spark.operators.analytics import (
        skyline_two_phase_orders,
    )

    def rows(nb):
        return {
            (r.o_orderkey, r.cents, r.order_date)
            for r in skyline_two_phase_orders(spark, sf_dir, n_buckets=nb).collect()
        }

    default = {
        (r.o_orderkey, r.cents, r.order_date)
        for r in skyline_two_phase_orders(spark, sf_dir).collect()
    }
    assert default, "empty frontier on non-empty orders"
    assert rows(1) == default
    assert rows(7) == default


def test_duplicate_spans_matches_independent_python(spark, sf_dir):
    """duplicate_spans vs a from-scratch Python implementation (not the
    mirrored SQL): position-indexed L-grams, occurrence counts, islands.
    Catches an error the SQL oracle can't — both engine queries encode the
    same algorithm, this one doesn't share a line with either."""
    import duckdb

    from stockmarket_bigdata_project_spark.catalog import table_path
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        SPAN_L,
        duplicate_spans,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{table_path(sf_dir, 'documents')}')"
    ).fetchall()

    from collections import Counter

    grams_per_doc = {}
    counts = Counter()
    for doc_id, text in docs:
        ws = text.split(" ")
        grams = [
            (pos + 1, " ".join(ws[pos : pos + SPAN_L]))
            for pos in range(len(ws) - SPAN_L + 1)
        ]
        grams_per_doc[doc_id] = grams
        counts.update(g for _, g in grams)

    expected = set()
    for doc_id, grams in grams_per_doc.items():
        dup_pos = sorted(p for p, g in grams if counts[g] >= 2)
        run: list[int] = []
        for p in dup_pos + [None]:
            if run and (p is None or p != run[-1] + 1):
                expected.add(
                    (doc_id, run[0], run[-1] + SPAN_L - 1, len(run))
                )
                run = []
            if p is not None:
                run.append(p)

    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in duplicate_spans(spark, sf_dir).collect()
    }
    assert got == expected


def test_substring_rewrite_removes_exactly_duplicates(spark, sf_dir):
    """Accounting invariant of the substring-dedup rewrite: the tokens
    removed from each doc are exactly the UNION of its non-canonical span
    positions (islands of gram starts closer than L overlap in token
    coverage, so a plain (k−1)·len sum overcounts), and no span's content
    disappears from the corpus (dedup removes copies, never information)."""
    import duckdb

    import pyspark.sql.functions as F

    from stockmarket_bigdata_project_spark.catalog import table_path
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        duplicate_spans,
        substring_dedup_rewrite,
    )

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{table_path(sf_dir, 'documents')}')"
        ).fetchall()
    )
    spans = duplicate_spans(spark, sf_dir).collect()
    from collections import Counter

    groups: dict[str, list] = {}
    for r in spans:
        ws = docs[r["doc_id"]].split(" ")
        content = " ".join(ws[r["span_start"] - 1 : r["span_end"]])
        groups.setdefault(content, []).append(
            (r["doc_id"], r["span_start"], r["span_end"])
        )

    cut_positions: dict[int, set] = {}
    for occ in groups.values():
        occ.sort()
        for d, s, e in occ[1:]:
            cut_positions.setdefault(d, set()).update(range(s, e + 1))
    expected_removed = sum(len(p) for p in cut_positions.values())

    out = substring_dedup_rewrite(spark, sf_dir)
    per_doc = {r["doc_id"]: r["n_removed"] for r in out.collect()}
    assert sum(per_doc.values()) == expected_removed
    for d, p in cut_positions.items():
        assert per_doc[d] == len(p), d

    corpus_after = " || ".join(
        r["deduped_text"] for r in out.collect()
    )
    # a duplicated span's content survives wherever its canonical
    # occurrence is not itself clipped by an OVERLAPPING cut span in the
    # same doc (islands of gram starts closer than L can overlap in token
    # coverage — the union-cut above is exactly that case)
    missing = []
    for c, occ in groups.items():
        if len(occ) < 2:
            continue
        d, s, e = occ[0]
        if cut_positions.get(d, set()).isdisjoint(range(s, e + 1)):
            if c not in corpus_after:
                missing.append(c)
    assert not missing, missing[:2]
