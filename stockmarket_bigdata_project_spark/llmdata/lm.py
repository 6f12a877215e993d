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


BPE_ROUNDS = 2  # trained merge rounds (merge → re-tokenize → recount)


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An actual distributed BPE TRAINER for ``BPE_ROUNDS`` rounds — not
    just round-1 statistics (`bpe_merge_candidates`): each round picks the
    corpus-weighted most frequent adjacent symbol pair (total order:
    weight DESC, pair ASC), applies the merge to every vocabulary word,
    re-tokenizes, and recounts — so round 2's winner is computed over the
    corpus AS RE-TOKENIZED by round 1's merge, exactly like Sennrich et
    al. 2016. Returns the merge table (round, left, right, merged, weight).

    Merge application is a single string replace over the space-delimited
    symbol string (`' l r '` → `' lr '`), scanning left-to-right
    non-overlapping — identical semantics in Spark and DuckDB. One
    documented deviation from strict greedy BPE: a run sharing boundary
    separators (`a b a b`) merges alternate occurrences per pass because
    the replace consumes the delimiter; deterministic and engine-identical.

    Scale shape per round: the corpus stays collapsed to its vocabulary
    (word, wf); pair counting is one hash aggregate over exploded symbol
    pairs; the winning merge is a 1-row broadcast applied map-side. The
    driver loop is K plan-building iterations — no data ever reaches the
    driver. A production trainer runs the same plan with the vocabulary
    staged as a table per round."""
    out, _ = _bpe_train(spark, sf_dir)
    return out.select(
        "merge_round",
        "l",
        "r",
        F.concat(F.col("l"), F.col("r")).alias("merged"),
        "weight",
    )


def _bpe_train(spark: SparkSession, sf_dir: str):
    """(merge table, trained vocabulary) — the vocabulary carries each
    word's FINAL symbol string after all BPE_ROUNDS merges, which is what
    the encode pass joins against."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    wfreq = words.groupBy("word").agg(F.count("*").alias("wf"))
    sym0 = F.concat(
        F.lit(" "),
        F.array_join(
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ),
            " ",
        ),
        F.lit(" "),
    )
    cur = wfreq.select("word", "wf", sym0.alias("sym"))
    out = None
    for rnd in range(1, BPE_ROUNDS + 1):
        syms = F.split(F.trim(F.col("sym")), " ")
        n = F.size(syms)
        prs = F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        counts = (
            cur.select("wf", F.explode(prs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wf").alias("weight"))
        )
        w = Window.orderBy(
            F.col("weight").desc(), F.col("l").asc(), F.col("r").asc()
        )
        top = (
            counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(
                F.lit(rnd).alias("merge_round"), "l", "r", "weight"
            )
        )
        out = top if out is None else out.unionByName(top)
        winner = top.select(F.col("l").alias("ml"), F.col("r").alias("mr"))
        cur = cur.crossJoin(F.broadcast(winner)).select(
            "word",
            "wf",
            F.replace(
                F.col("sym"),
                F.concat(
                    F.lit(" "), F.col("ml"), F.lit(" "), F.col("mr"), F.lit(" ")
                ),
                F.concat(F.lit(" "), F.col("ml"), F.col("mr"), F.lit(" ")),
            ).alias("sym"),
        )
    return out, cur


def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENCODE half of the BPE surface: apply the trained merge table to
    the whole corpus and report, per document, the numbers a training
    pipeline actually budgets with — word count, encoded BPE token count,
    longest learned symbol used, and how many words collapsed to a single
    token. Pure-BIGINT output (playbook rule 11).

    Scale shape (the part that matters at 100 TB): encoding happens ONCE
    PER DISTINCT WORD — the trained vocabulary (word → final symbol
    string) is vocab-sized, and the corpus joins against it on `word`
    (plain equi-join, vocab is NOT assumed broadcastable at real scale;
    AQE may still broadcast it locally). The token stream itself is never
    re-derived per occurrence, which is the difference between encoding
    the vocabulary and encoding 100 TB of text."""
    _, vocab = _bpe_train(spark, sf_dir)
    syms = F.split(F.trim("sym"), " ")
    enc = vocab.select(
        "word",
        F.size(syms).alias("n_syms"),
        F.array_max(F.transform(syms, F.length)).alias("max_sym_len"),
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    return (
        toks.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
            F.max("max_sym_len").alias("max_symbol_len"),
            F.sum((F.col("n_syms") == 1).cast("long")).alias(
                "n_single_token_words"
            ),
        )
    )


QUERIES["bpe_train_merges"] = bpe_train_merges
QUERIES["bpe_encode_stats"] = bpe_encode_stats


def _bpe_round_sql(k: int) -> str:
    """CTE pair: c{k} counts pairs over s{k-1}; s{k} applies c{k}'s winner."""
    return f"""c{k} AS MATERIALIZED (
  SELECT l, r, weight,
         row_number() OVER (ORDER BY weight DESC, l ASC, r ASC) AS rk
  FROM (
    SELECT t[i] AS l, t[i + 1] AS r, CAST(sum(wf) AS BIGINT) AS weight
    FROM (SELECT wf, t, unnest(range(1, len(t))) AS i
          FROM (SELECT wf, string_split(trim(sym), ' ') AS t FROM s{k - 1}))
    GROUP BY l, r
  )
), s{k} AS MATERIALIZED (
  SELECT wf,
         replace(sym, ' ' || m.l || ' ' || m.r || ' ',
                 ' ' || m.l || m.r || ' ') AS sym
  FROM s{k - 1}, (SELECT l, r FROM c{k} WHERE rk = 1) m
)"""


_BPE_ROUNDS_SQL = ",\n".join(_bpe_round_sql(k) for k in range(1, BPE_ROUNDS + 1))
_BPE_UNION_SQL = "\nUNION ALL\n".join(
    f"SELECT {k} AS merge_round, l, r, l || r AS merged, weight "
    f"FROM c{k} WHERE rk = 1"
    for k in range(1, BPE_ROUNDS + 1)
)

ORACLE["bpe_train_merges"] = f"""
WITH wfreq AS MATERIALIZED (
  SELECT word, count(*) AS wf
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
), s0 AS MATERIALIZED (
  SELECT wf,
         ' ' || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substring(word, CAST(i AS INTEGER), 1)),
           ' ') || ' ' AS sym
  FROM wfreq
),
{_BPE_ROUNDS_SQL}
{_BPE_UNION_SQL}
"""


def _bpe_round_sql_enc(k: int) -> str:
    """Encode-side round CTEs: identical merge arithmetic to
    _bpe_round_sql, but the symbol states carry `word` so the trained
    vocabulary can join back onto the corpus."""
    return f"""e_c{k} AS MATERIALIZED (
  SELECT l, r,
         row_number() OVER (ORDER BY weight DESC, l ASC, r ASC) AS rk
  FROM (
    SELECT t[i] AS l, t[i + 1] AS r, CAST(sum(wf) AS BIGINT) AS weight
    FROM (SELECT wf, t, unnest(range(1, len(t))) AS i
          FROM (SELECT wf, string_split(trim(sym), ' ') AS t FROM e_s{k - 1}))
    GROUP BY l, r
  )
), e_s{k} AS MATERIALIZED (
  SELECT word, wf,
         replace(sym, ' ' || m.l || ' ' || m.r || ' ',
                 ' ' || m.l || m.r || ' ') AS sym
  FROM e_s{k - 1}, (SELECT l, r FROM e_c{k} WHERE rk = 1) m
)"""


_BPE_ENC_ROUNDS_SQL = ",\n".join(
    _bpe_round_sql_enc(k) for k in range(1, BPE_ROUNDS + 1)
)

ORACLE["bpe_encode_stats"] = f"""
WITH wfreq AS MATERIALIZED (
  SELECT word, count(*) AS wf
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
), e_s0 AS MATERIALIZED (
  SELECT word, wf,
         ' ' || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substring(word, CAST(i AS INTEGER), 1)),
           ' ') || ' ' AS sym
  FROM wfreq
),
{_BPE_ENC_ROUNDS_SQL},
enc AS MATERIALIZED (
  SELECT word,
         CAST(len(string_split(trim(sym), ' ')) AS INTEGER) AS n_syms,
         CAST(list_max(list_transform(string_split(trim(sym), ' '),
                                      s -> length(s))) AS INTEGER)
           AS max_sym_len
  FROM e_s{BPE_ROUNDS}
), toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT doc_id, count(*) AS n_words,
       CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens,
       CAST(max(max_sym_len) AS INTEGER) AS max_symbol_len,
       CAST(sum(CASE WHEN n_syms = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_token_words
FROM toks JOIN enc USING (word)
GROUP BY doc_id
"""


def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword tokens emitted per
    whitespace word (the BPE-ish regex segmenter over the corpus, the
    same segmentation token_counts uses) — THE multilingual-tokenizer
    health metric: a language whose fertility is 2× another's pays 2×
    the sequence length for the same content, and vocab allocation is
    rebalanced on exactly this table. Fertility ships as round-half-up
    micros of Σsubwords/Σwords — pure BIGINTs.

    Shape: one map-side per-doc projection (two counters per row), one
    |langs|-row hash aggregate. [extension]"""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " ")).cast("long")
    sub = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[a-z]{1,4}|[0-9]+|[^a-z0-9 ]"), 0
        )
    ).cast("long")
    per = docs.select("lang", ws.alias("ws"), sub.alias("sub"))
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws").alias("total_words"),
        F.sum("sub").alias("total_subwords"),
        F.expr(
            "(2 * 1000000 * sum(sub) + sum(ws)) DIV (2 * sum(ws))"
        ).alias("fertility_micro"),
    )


QUERIES["tokenizer_fertility_by_lang"] = tokenizer_fertility_by_lang

ORACLE["tokenizer_fertility_by_lang"] = """
WITH per AS (
  SELECT lang,
         len(string_split(text, ' ')) AS ws,
         len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]+|[^a-z0-9 ]'))
           AS sub
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(ws) AS BIGINT) AS total_words,
       CAST(sum(sub) AS BIGINT) AS total_subwords,
       CAST((2 * 1000000 * sum(sub) + sum(ws)) // (2 * sum(ws)) AS BIGINT)
         AS fertility_micro
FROM per GROUP BY lang
"""
