"""Python UDTF + grouped-agg pandas UDAF — the last two cells of the UDF
surface (SURVEY §2.11 lists the reference's scalar UDF and pandas-apply; the
engine replaces those with native expressions / pandas_udf, and this module
pins the remaining kinds Spark supports).

Both are deliberately the SLOW path and the docstrings say when to take it:
a UDTF runs row-at-a-time Python (use only for table-generating semantics
that explode()+builtins cannot express, or to integrate Python libraries);
a grouped-agg pandas UDF materializes each group as a pandas Series (bounded
group cardinality required — here per-supplier, never per-returnflag).

Determinism contract (COVERAGE.md playbook): the UDTF emits pure string/int
functions of its input row; the UDAF does integer-cents arithmetic so its
result is identical under any within-group row order — a grouped-agg UDF
receives rows in shuffle order, so any float accumulation there would not
even be run-to-run stable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf, udtf

from ..catalog import load_table

CHUNK = 32
STRIDE = 16


# --- Python UDTF: sliding-window document chunker ----------------------------
class DocChunker:
    """One row per (CHUNK)-token window at (STRIDE)-token steps — the
    training-data chunking step of an LLM pipeline (context packing for
    fixed-window models). Word-split tokenization to stay library-free.
    Wrapped by @udtf lazily (decorating at import time requires an active
    SparkContext, which a bare module import must not assume)."""

    def eval(self, text: str):
        if text is None:
            return
        words = text.split(" ")
        n = len(words)
        for k, start in enumerate(range(0, max(n, 1), STRIDE)):
            if start >= n:
                break
            window = words[start : start + CHUNK]
            yield k, " ".join(window), len(window)


def udtf_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL-join the UDTF against documents: each doc fans out to its
    overlapping chunks. Note the native twin exists (explode(transform(
    sequence(...)))) and is what a hot path should use; the UDTF form is the
    integration point for real tokenizers (tiktoken etc.) that have no
    builtin equivalent. [extension]"""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register(
        "doc_chunker",
        udtf(DocChunker, returnType="chunk_idx int, chunk_text string, n_tokens int"),
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM documents d, LATERAL doc_chunker(d.text) c
        """
    )


# --- grouped-agg pandas UDAF: exact weighted average -------------------------
def _wavg_price_cents():
    @pandas_udf("double")
    def wavg(px: pd.Series, qty: pd.Series) -> float:
        # integer-cents x integer-qty: exact int64 arithmetic regardless of
        # the (undefined) row order the group arrives in; one float division
        # at the end. Max |sum| ~ 1.1e7 cents * 50 qty * rows — below 2^63.
        cents = (px * 100).round().astype("int64")
        q = qty.astype("int64")
        return float((cents * q).sum()) / (100.0 * q.sum())

    return wavg


def pandas_udaf_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average unit price per supplier via a grouped-agg
    pandas UDF — the custom-UDAF surface. Per-supplier groups are bounded
    (a supplier's lineitems), so materializing each group as a Series is
    safe at scale; the same UDAF keyed on a 3-value column would not be.
    [extension]"""
    li = load_table(spark, sf_dir, "lineitem")

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT) — so the companion count is a second
    # pandas aggregate, not F.sum
    @pandas_udf("long")
    def qty_sum(qty: pd.Series) -> int:
        return int(qty.astype("int64").sum())

    return (
        li.groupBy("l_suppkey")
        .agg(
            _wavg_price_cents()("l_extendedprice", "l_quantity").alias("wavg_price"),
            qty_sum("l_quantity").alias("total_qty"),
        )
    )


QUERIES = {
    "udtf_doc_chunks": udtf_doc_chunks,
    "pandas_udaf_weighted_price": pandas_udaf_weighted_price,
}

ORACLE = {
    "udtf_doc_chunks": f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
idx AS (
  SELECT doc_id, words,
         unnest(range(0, greatest(len(words), 1), {STRIDE})) AS start
  FROM w
)
SELECT doc_id,
       CAST(start / {STRIDE} AS INTEGER) AS chunk_idx,
       array_to_string(words[start + 1 : start + {CHUNK}], ' ') AS chunk_text,
       CAST(least({CHUNK}, len(words) - start) AS INTEGER) AS n_tokens
FROM idx WHERE start < len(words)
""",
    "pandas_udaf_weighted_price": """
SELECT l_suppkey,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(l_quantity AS BIGINT)) AS DOUBLE)
         / (100.0 * sum(CAST(l_quantity AS BIGINT))) AS wavg_price,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM lineitem GROUP BY l_suppkey
""",
}
