"""Third-opinion oracles (r3 verdict task 2, second layer): for the
tokenization/regex-heavy queries that went red at the r3 gate, recompute
the expected result in PURE PYTHON from the parquet bytes — no Spark, no
DuckDB — and require the Spark result to match it exactly. The DuckDB
oracle and the Spark plan could drift together on a shared idiom
(regexp_extract_all semantics, string_split edge cases) and the pairwise
compare would stay green; a third independent implementation breaks the
tie. (The r3 reds' actual root cause — HUGEINT dtype leakage — is caught
by test_oracle_portability; this guards the residual value-level class.)"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from stockmarket_bigdata_project_spark.catalog import table_path
from stockmarket_bigdata_project_spark.llmdata.textstats import (
    N_RARE_TOKENS,
    rare_token_ratio,
    token_counts,
    vocab_frequency_spectrum,
)

_BPE_RE = re.compile(r"[a-z]{1,4}|[0-9]+|[^a-z0-9 ]")


def _docs(sf_dir):
    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["doc_id", "source", "text"])
    return list(zip(*[t.column(c).to_pylist()
                      for c in ("doc_id", "source", "text")]))


def _round_half_up_micro(num: int, den: int) -> int:
    return (2 * 1_000_000 * num + den) // (2 * den)


def test_token_counts_pure_python(spark, sf_dir):
    per_source = defaultdict(lambda: [0, 0, 0])  # n_docs, ws, bpe
    for _, source, text in _docs(sf_dir):
        s = per_source[source]
        s[0] += 1
        s[1] += len(text.split(" "))
        s[2] += len(_BPE_RE.findall(text))
    expect = {
        src: (n, ws, bpe, _round_half_up_micro(bpe, n))
        for src, (n, ws, bpe) in per_source.items()
    }
    got = {
        r.source: (r.n_docs, r.total_ws_tokens, r.total_bpe_tokens,
                   r.avg_bpe_micro)
        for r in token_counts(spark, sf_dir).collect()
    }
    assert got == expect


def test_vocab_frequency_spectrum_pure_python(spark, sf_dir):
    vocab = Counter()
    for _, _, text in _docs(sf_dir):
        vocab.update(text.split(" "))
    spectrum = defaultdict(lambda: [0, 0])
    for freq in vocab.values():
        spectrum[freq][0] += 1
        spectrum[freq][1] += freq
    expect = {f: tuple(v) for f, v in spectrum.items()}
    got = {
        r.tok_freq: (r.n_types, r.token_mass)
        for r in vocab_frequency_spectrum(spark, sf_dir).collect()
    }
    assert got == expect


def test_rare_token_ratio_pure_python(spark, sf_dir):
    rows = _docs(sf_dir)
    vocab = Counter()
    for _, _, text in rows:
        vocab.update(text.split(" "))
    rare = {
        tok for tok, _ in sorted(vocab.items(), key=lambda kv: (kv[1], kv[0]))
        [:N_RARE_TOKENS]
    }
    expect = {}
    for doc_id, _, text in rows:
        toks = text.split(" ")
        n_rare = sum(1 for t in toks if t in rare)
        expect[doc_id] = (
            len(toks), n_rare, _round_half_up_micro(n_rare, len(toks))
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_rare, r.rare_ratio_micro)
        for r in rare_token_ratio(spark, sf_dir).collect()
    }
    assert got == expect
