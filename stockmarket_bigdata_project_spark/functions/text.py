"""Text layer: ticker extraction (both reference regex variants) and the
deterministic sentiment proxy (SURVEY §2.8-String, §2.10 M1/M2, §2.11).

The reference registers a row-at-a-time Python UDF for ticker extraction
(spark_consumer.py:35-41 v1; reddit_pipeline.py:58-73 v2 — the two variants
differ on 1-letter tickers: v2 requires a '$' prefix; SURVEY §7.3-1). A Python
UDF forks a worker per executor and pickles every row across the boundary —
at 100 TB that is the bottleneck. Here both variants are pure Catalyst
expressions: regexp_extract_all → array_distinct → array_intersect(known),
entirely inside whole-stage codegen.

VADER sentiment (stock_pipeline.py:139,182-200) is not in this container and
is not deterministic across versions; the engine ships a deterministic
lexicon polarity score (pos/neg wordlist counts over tokens) that is
oracle-checkable, plus the same aggregate feature shapes (mean/std/pos-ratio/
neg-ratio — the reference's len(dropna) denominator semantics).

The documents table's vocabulary plays the ticker universe: 'known tickers'
are frequent vocab words, cashtags are synthesized in-query (deterministically)
so both regex variants are exercised identically in Spark and DuckDB.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

# the "known tickers" universe (vocabulary words present in documents.text)
KNOWN_TICKERS = ["scan", "join", "merge", "hash", "sort", "agg"]
# marker words for the deterministic sentiment lexicon
POS_WORDS = ["fast", "small"]
NEG_WORDS = ["slow", "big"]


def _cashtag_text() -> F.Column:
    """Deterministic synthetic post text: '$<LANG> <text>' — gives every doc
    exactly one cashtag so the v2 ($-required) variant has signal."""
    return F.concat(F.lit("$"), F.upper("lang"), F.lit(" "), F.col("text"))


def extract_tickers_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 (spark_consumer.py:37): bare tokens count as tickers. Native
    expression replaces the reference's Python UDF; output exploded to
    (doc_id, ticker) rows for oracle stability."""
    docs = load_table(spark, sf_dir, "documents")
    matches = F.array_distinct(
        F.regexp_extract_all(F.col("text"), F.lit(r"\b([a-z]{1,5})\b"), 1)
    )
    tickers = F.array_intersect(
        matches, F.array(*[F.lit(t) for t in KNOWN_TICKERS])
    )
    return (
        docs.select("doc_id", F.explode(tickers).alias("ticker"))
    )


def extract_tickers_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 (reddit_pipeline.py:63): 1-2 char tickers require the '$' prefix;
    longer bare tokens still match. Exercised on synthesized cashtag text."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "post", _cashtag_text()
    )
    dollar = F.regexp_extract_all(F.col("post"), F.lit(r"\$([A-Z]{1,5})"), 1)
    bare = F.regexp_extract_all(F.col("post"), F.lit(r"\b([a-z]{3,5})\b"), 1)
    tickers = F.array_distinct(F.concat(dollar, bare))
    known = F.array(
        *[F.lit(t) for t in KNOWN_TICKERS],
        *[F.lit(s.upper()) for s in ("de", "en", "fr", "es", "zh")],
    )
    return docs.select(
        "doc_id", F.explode(F.array_intersect(tickers, known)).alias("ticker")
    )


def sentiment_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: deterministic lexicon polarity ∈ [-1, 1]:
    (pos_hits − neg_hits) / total_tokens, quantized at 6dp.

    The quantization is integer-rational (round-half-away on |d|/n in
    micro-units), not `round(double, 6)` — engines disagree on rounding a
    genuine-real quotient at half-microunit boundaries (playbook rule 1;
    the sf0.1 sweep caught exactly this class on quality scores in r2)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def count_word(w: str) -> F.Column:
        # single-param lambda: a (t, i) signature would make F.filter pass the
        # array index as the second argument
        return F.size(F.filter(toks, lambda t: t == F.lit(w)))

    pos = sum(count_word(w) for w in POS_WORDS)
    neg = sum(count_word(w) for w in NEG_WORDS)
    d = (pos - neg).cast("long")
    nt = F.size(toks).cast("long")
    num = F.abs(d) * F.lit(2_000_000).cast("long") + nt
    den = 2 * nt
    q = ((num - F.pmod(num, den)) / den).cast("long")
    sign = (
        F.when(d > 0, F.lit(1)).when(d < 0, F.lit(-1)).otherwise(F.lit(0))
    ).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        ((sign * q).cast("double") / F.lit(1.0e6)).alias("sentiment"),
    )


VADER_ALPHA = 15.0  # VADER's compound-score normalization constant


def sentiment_udf(lexicon: dict[str, float] | None = None,
                  normalization: str = "ratio"):
    """The pluggable M1 inference slot: an Arrow-batched pandas_udf around
    ANY word→valence lexicon — nltk's VADER lexicon
    (`SentimentIntensityAnalyzer().lexicon`, reference
    stock_pipeline.py:139) is exactly this shape and drops straight in.
    Built lazily (pandas_udf type resolution needs an active session).

    normalization:
      'ratio' — Σvalence / n_tokens: with the default ±1 wordlist this is
                the raw form of the oracle-checked `sentiment_score`
                (which additionally quantizes at 6dp);
      'vader' — VADER's compound normalization d/sqrt(d²+α), α=15 — the
                score a real VADER port produces from the summed valences
                (minus VADER's intensifier/negation heuristics, which need
                its full rule engine, not just the lexicon).

    The default deterministic lexicon keeps results engine-checkable; a
    real lexicon makes scores VADER-comparable at the cost of oracle
    checkability — same trade as ml.predict_udf's model slot."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    lex = lexicon if lexicon is not None else {
        **{w: 1.0 for w in POS_WORDS},
        **{w: -1.0 for w in NEG_WORDS},
    }
    if normalization not in ("ratio", "vader"):
        raise ValueError(f"unknown normalization {normalization!r}")
    use_vader = normalization == "vader"

    @pandas_udf("double")
    def _score(text: pd.Series) -> pd.Series:
        def one(t: str) -> float:
            toks = t.split(" ")
            d = sum(lex.get(tok, 0.0) for tok in toks)
            if use_vader:
                return d / ((d * d + VADER_ALPHA) ** 0.5)
            return d / len(toks) if toks else 0.0

        return pd.Series(np.fromiter((one(t) for t in text), dtype="float64",
                                     count=len(text)))

    return _score


def sentiment_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: per-group sentiment distribution features (mean/std/pos/neg ratio
    — denominator = non-null count, the reference's semantics,
    stock_pipeline.py:186-200)."""
    s = sentiment_score(spark, sf_dir)
    # sentiment is per-row rounded to 6dp, so DECIMAL(27,6)/(27,12) sums of
    # it and its square are lossless — mean and stddev become exact-sum
    # algebra, deterministic under any shuffle-merge order (built-in
    # avg/stddev over doubles are not even run-to-run stable).
    s1 = F.sum(F.col("sentiment").cast("decimal(27,6)")).cast("double")
    s2 = F.sum(
        (F.col("sentiment") * F.col("sentiment")).cast("decimal(27,12)")
    ).cast("double")
    nv = F.count("sentiment")
    return s.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (s1 / nv).alias("sentiment_mean"),
        F.sqrt(
            (s2 - s1 * s1 / nv) / F.nullif((nv - 1).cast("double"), F.lit(0.0))
        ).alias("sentiment_std"),
        F.avg((F.col("sentiment") > 0).cast("int")).alias("pos_ratio"),
        F.avg((F.col("sentiment") < 0).cast("int")).alias("neg_ratio"),
    )


QUERIES = {
    "extract_tickers_v1": extract_tickers_v1,
    "extract_tickers_v2": extract_tickers_v2,
    "sentiment_score": sentiment_score,
    "sentiment_features": sentiment_features,
}

_KNOWN_SQL = "', '".join(KNOWN_TICKERS)

_SENTIMENT_SQL = f"""
SELECT doc_id, lang,
       CAST((CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 ELSE 0 END)
            * CAST((num - (num % den)) / den AS BIGINT) AS DOUBLE)
         / 1000000.0 AS sentiment
FROM (
  SELECT doc_id, lang, d, abs(d) * 2000000 + nt AS num, 2 * nt AS den
  FROM (
    SELECT doc_id, lang,
           CAST(len(list_filter(string_split(text, ' '), t -> t IN ('{POS_WORDS[0]}', '{POS_WORDS[1]}')))
            - len(list_filter(string_split(text, ' '), t -> t IN ('{NEG_WORDS[0]}', '{NEG_WORDS[1]}'))) AS BIGINT) AS d,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
    FROM documents
  )
)
"""

ORACLE = {
    "extract_tickers_v1": f"""
SELECT doc_id, ticker FROM (
  SELECT doc_id,
         unnest(list_distinct(regexp_extract_all(text, '\\b([a-z]{{1,5}})\\b', 1))) AS ticker
  FROM documents
) WHERE ticker IN ('{_KNOWN_SQL}')
""",
    "extract_tickers_v2": f"""
WITH posts AS (
  SELECT doc_id, '$' || upper(lang) || ' ' || text AS post FROM documents
)
SELECT doc_id, ticker FROM (
  SELECT doc_id,
         unnest(list_distinct(
           regexp_extract_all(post, '\\$([A-Z]{{1,5}})', 1)
           || regexp_extract_all(post, '\\b([a-z]{{3,5}})\\b', 1)
         )) AS ticker
  FROM posts
) WHERE ticker IN ('{_KNOWN_SQL}', 'DE', 'EN', 'FR', 'ES', 'ZH')
""",
    "sentiment_score": _SENTIMENT_SQL,
    "sentiment_features": f"""
WITH s AS ({_SENTIMENT_SQL})
SELECT lang, count(*) AS n_docs,
       CAST(sum(CAST(sentiment AS DECIMAL(27,6))) AS DOUBLE)
         / count(sentiment) AS sentiment_mean,
       sqrt((CAST(sum(CAST(sentiment * sentiment AS DECIMAL(27,12))) AS DOUBLE)
             - CAST(sum(CAST(sentiment AS DECIMAL(27,6))) AS DOUBLE)
               * CAST(sum(CAST(sentiment AS DECIMAL(27,6))) AS DOUBLE)
               / count(sentiment))
            / NULLIF(CAST(count(sentiment) - 1 AS DOUBLE), 0.0)) AS sentiment_std,
       avg(CASE WHEN sentiment > 0 THEN 1 ELSE 0 END) AS pos_ratio,
       avg(CASE WHEN sentiment < 0 THEN 1 ELSE 0 END) AS neg_ratio
FROM s GROUP BY lang
""",
}
