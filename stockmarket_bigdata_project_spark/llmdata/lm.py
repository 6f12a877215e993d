"""Tokenizer-training and n-gram language-model statistics (north-star
extension, BASELINE.json) — the two corpus-modelling passes that sit next to
dedup/quality in an LLM data pipeline:

  * ``bigram_lm_bits``: a self-trained BIGRAM language model scoring each
    document by its conditional Shannon bit cost — the order-2 upgrade of
    ``textstats.lm_perplexity_bits`` (CCNet's KenLM filter, Wenzek et al.
    2020, uses order-5). A doc whose word PAIRS are corpus-rare scores high
    even when every individual word is common — exactly the signal that
    separates shuffled-word spam from fluent text, which no unigram model
    can see.
  * ``bpe_merge_candidates``: the first iteration of byte-pair-encoding
    tokenizer training (Sennrich et al. 2016): corpus-frequency-weighted
    counts of adjacent character pairs inside words, ranked. This is the
    merge table a distributed BPE trainer materializes each round; one
    round is exact and oracle-able, while the full iterative trainer is a
    driver loop over re-tokenized pair tables (same shape, K times).

Exactness: both queries follow the playbook — no transcendental ever
touches an output column. Bit costs are Shannon-code word lengths
``ilog2(ctx_freq div pair_freq) = length(bin(quotient)) - 1``, identical
integers in Spark and DuckDB; the only doubles are single binary64
divisions of exact integers.

Design for 100 TB:
  * bigram LM: occurrence table (doc_id, w1, w2) → pair counts
    (hash-partitioned on the pair), context counts derived FROM the pair
    table (vocab-sized, never the corpus), bits joined back on the pair
    key, one final per-doc aggregate. Linear, all equi-shuffles; the
    unbounded vocab is never broadcast or collected.
  * BPE merges: per-DISTINCT-word pair explosion weighted by word
    frequency — the corpus collapses to its vocabulary before any
    character work, and the pair-count table is bounded by |charset|²,
    so the final ranking window is effectively free at any scale.

The reference has no LM or tokenizer layer at all (it feeds raw text to
VADER, stock_pipeline.py:139); this extends SURVEY §2.10 curation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table

N_BPE_MERGES = 20  # merge-table rows exposed (one trainer round's top ranks)


def bigram_lm_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc conditional bit cost under a corpus-trained bigram LM.

    bits(w1→w2) = ilog2(ctx(w1) div freq(w1,w2)) where ctx(w1) is w1's
    count as a bigram CONTEXT (= Σ_w2 freq(w1,w2)), so the quotient is ≥ 1
    and the bit cost ≥ 0 with no smoothing term needed. Docs with a single
    token have no bigrams and drop out (both engines agree — inner join
    semantics)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    occ = docs.select("doc_id", F.explode(bigrams).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    pair = occ.groupBy("w1", "w2").agg(F.count("*").alias("freq_p"))
    ctx = pair.groupBy("w1").agg(F.sum("freq_p").alias("freq_c"))
    bits_tbl = pair.join(ctx, "w1").select(
        "w1",
        "w2",
        (F.length(F.bin(F.expr("freq_c div freq_p"))) - F.lit(1)).alias("bits"),
    )
    per_doc = (
        occ.join(bits_tbl, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("bits").alias("sum_bits"))
    )
    # round-half-up micro-quantized mean (textstats._round_div_micro idiom)
    mean_micro = F.expr(
        "(2 * sum_bits * 1000000 + n_bigrams) div (2 * n_bigrams)"
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "sum_bits",
        (mean_micro / F.lit(1_000_000.0)).alias("mean_bits"),
    )


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``N_BPE_MERGES`` adjacent character pairs by corpus-weighted
    count — BPE training round 1. Weight of pair p = Σ over vocabulary
    words w of corpus_freq(w) × (occurrences of p in w, overlapping).
    Deterministic total order (weight DESC, pair ASC) makes the LIMIT and
    the rank column engine-stable."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    wfreq = words.groupBy("word").agg(F.count("*").alias("wf"))
    # overlapping char pairs of each distinct word; guarded because Spark's
    # sequence(1, 0) is a DESCENDING [1, 0], not empty
    pairs_expr = F.expr(
        "CASE WHEN length(word) >= 2 THEN "
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2)) "
        "ELSE CAST(array() AS array<string>) END"
    )
    exploded = wfreq.select("wf", F.explode(pairs_expr).alias("pair"))
    counts = exploded.groupBy("pair").agg(F.sum("wf").alias("weight"))
    w = Window.orderBy(F.col("weight").desc(), F.col("pair").asc())
    # the pair-count table is bounded by |charset|² rows, so the global
    # single-partition ranking window is constant-sized at any corpus scale
    return (
        counts.select(
            "pair", "weight", F.row_number().over(w).alias("merge_rank")
        )
        .filter(F.col("merge_rank") <= N_BPE_MERGES)
        .select("merge_rank", "pair", "weight")
    )


QUERIES = {
    "bigram_lm_bits": bigram_lm_bits,
    "bpe_merge_candidates": bpe_merge_candidates,
}

ORACLE = {
    "bigram_lm_bits": """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), occ AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
), pair AS (
  SELECT w1, w2, count(*) AS freq_p FROM occ GROUP BY w1, w2
), ctx AS (
  SELECT w1, CAST(sum(freq_p) AS BIGINT) AS freq_c FROM pair GROUP BY w1
), bits_tbl AS (
  SELECT w1, w2, length(bin(freq_c // freq_p)) - 1 AS bits
  FROM pair JOIN ctx USING (w1)
), per_doc AS (
  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(bits) AS BIGINT) AS sum_bits
  FROM occ JOIN bits_tbl USING (w1, w2) GROUP BY doc_id
)
SELECT doc_id, n_bigrams, sum_bits,
       ((2 * sum_bits * 1000000 + n_bigrams) // (2 * n_bigrams)) / 1000000.0
         AS mean_bits
FROM per_doc
""",
    "bpe_merge_candidates": f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
), wfreq AS (
  SELECT word, count(*) AS wf FROM words GROUP BY word
), prs AS (
  SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, wf
  FROM (SELECT word, wf, unnest(range(1, length(word))) AS i FROM wfreq)
), counts AS (
  SELECT pair, CAST(sum(wf) AS BIGINT) AS weight FROM prs GROUP BY pair
)
SELECT CAST(row_number() OVER (ORDER BY weight DESC, pair ASC) AS INTEGER)
         AS merge_rank,
       pair, weight
FROM counts
ORDER BY weight DESC, pair ASC LIMIT {N_BPE_MERGES}
""",
}
