"""End-to-end training-corpus curation pipeline (north-star extension):
quality filter → exact dedup → near-dedup cluster resolution, composed into
one declarative plan — the flagship "clean the corpus" query every LLM data
pipeline runs before tokenization.

Composition, not re-implementation: quality comes from textstats.quality
expressions, exact survivorship from dedup's normalized-hash window, near-dup
survivorship from the connected-components resolution over verified LSH
pairs. Catalyst sees the whole thing as one plan: the documents scan is
shared, filters are pushed down, and the two survivor checks are anti-joins
on (doc_id) — the corpus text itself is never shuffled by the dedup steps.

At 100 TB: the quality filter is a map-side projection (no shuffle); exact
dedup shuffles (hash, doc_id) pairs only; near-dedup shuffles shingle tokens
once plus the tiny pair graph. The expensive text column is dropped before
the first exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from .dedup import _CC_CHAIN, _normalized, minhash_dup_components
from .textstats import QUALITY_MICRO_SQL, STOPWORDS, quality_exprs

QUALITY_MIN = 0.5


def _quality_cols() -> dict[str, F.Column]:
    """The textstats quality expressions (delegated to
    textstats.quality_exprs — one source of truth for the formula and the
    stopword list). Still one plan over one documents scan: these are plain
    Column expressions, composed into this pipeline's projection."""
    q = quality_exprs()
    return {
        "n_tokens": q["n_tokens"],
        "quality_score": q["quality_score"],
        "quality_micro": q["quality_micro"],
    }


def _clean_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_clean plus the integer micro-unit quality column the stats
    aggregate sums exactly (kept out of corpus_clean's public schema)."""
    docs = load_table(spark, sf_dir, "documents")
    q = _quality_cols()
    exact_keep = F.min("doc_id").over(Window.partitionBy(F.md5(_normalized())))
    base = (
        docs.select(
            "doc_id",
            "lang",
            "source",
            q["n_tokens"].alias("n_tokens"),
            q["quality_score"].alias("quality_score"),
            q["quality_micro"].alias("quality_micro"),
            (F.col("doc_id") == exact_keep).alias("_exact_keep"),
        )
        .filter(F.col("quality_score") >= QUALITY_MIN)
        .filter("_exact_keep")
        .drop("_exact_keep")
    )
    near_losers = (
        minhash_dup_components(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("component"))
        .select("doc_id")
    )
    return base.join(near_losers, "doc_id", "left_anti")


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated corpus: docs passing the quality floor, surviving exact
    dedup (min doc_id per normalized text) AND near-dedup (canonical member
    of their LSH component, or not in any component)."""
    return _clean_docs(spark, sf_dir).drop("quality_micro")


def corpus_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the pipeline reports: per-source kept-doc counts and token mass
    of the curated corpus (the number that decides a training run's size).
    All-BIGINT output: the mean quality is reported as an exact micro-unit
    sum (sum_quality_micro / n_docs at the consumer) — r3's gate red was
    the oracle's sum(int) → HUGEINT in a driver-side dtype conversion, and
    pure-BIGINT output with explicit oracle casts removes the class."""
    clean = _clean_docs(spark, sf_dir)
    return clean.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("quality_micro").alias("sum_quality_micro"),
    )


def training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's terminal artifact in ONE declarative plan: curate the
    corpus (quality floor → exact dedup → near-dedup resolution), address
    every surviving doc into a deterministic epoch shard
    (sampling.epoch_shuffle_order's salted-md5 hash), and emit the
    per-(shard, source) manifest — doc count and token mass — that a
    training launcher reads to schedule its data loaders.

    Composition, not re-implementation: the curation comes from
    _clean_docs (same plan as corpus_clean), the shard address from the
    same hash the shuffle-order query uses. Catalyst sees one tree; the
    manifest adds a single map-side hash + one K·S-row aggregate on top
    of the curation plan. All-BIGINT output (playbook rule 11)."""
    from .sampling import EPOCH_SEED, N_EPOCH_SHARDS

    clean = _clean_docs(spark, sf_dir)
    h = F.md5(
        F.concat(F.lit(EPOCH_SEED + ":"), F.col("doc_id").cast("string"))
    )
    hv = F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
    return (
        clean.withColumn("shard", hv % N_EPOCH_SHARDS)
        .groupBy("shard", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("quality_micro").alias("sum_quality_micro"),
        )
    )


QUERIES = {
    "corpus_clean": corpus_clean,
    "corpus_clean_stats": corpus_clean_stats,
    "training_manifest": training_manifest,
}

_CLEAN_SQL = f"""
qbase AS (
  SELECT doc_id, lang, source, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT) AS c,
         CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('{{stop_list}}'))) AS BIGINT) AS stop
  FROM documents
),
quality AS (
  SELECT doc_id, lang, source,
         CAST(n AS INTEGER) AS n_tokens,
         CASE WHEN n < 10 THEN 0.0
              ELSE {{quality_micro}} / 1000000.0
         END AS quality_score,
         CASE WHEN n < 10 THEN CAST(0 AS BIGINT)
              ELSE CAST({{quality_micro}} AS BIGINT)
         END AS quality_micro,
         min(doc_id) OVER (
           PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         ) AS exact_keeper
  FROM qbase
),
clean AS (
  SELECT doc_id, lang, source, n_tokens, quality_score, quality_micro
  FROM quality
  WHERE quality_score >= {QUALITY_MIN}
    AND doc_id = exact_keeper
    AND doc_id NOT IN (SELECT doc_id FROM comps WHERE doc_id != component)
)
""".format(
    stop_list="', '".join(STOPWORDS),
    quality_micro=QUALITY_MICRO_SQL,
    QUALITY_MIN=QUALITY_MIN,
)

ORACLE = {
    "corpus_clean": f"""
{_CC_CHAIN},
{_CLEAN_SQL.strip()}
SELECT doc_id, lang, source, n_tokens, quality_score FROM clean
""",
    "corpus_clean_stats": f"""
{_CC_CHAIN},
{_CLEAN_SQL.strip()}
SELECT source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(quality_micro) AS BIGINT) AS sum_quality_micro
FROM clean GROUP BY source
""",
}

_SHARD_HEX16 = " + ".join(
    f"(strpos('0123456789abcdef', substring(h, {d + 1}, 1)) - 1)"
    f" * {16 ** (3 - d)}"
    for d in range(4)
)


def _manifest_oracle() -> str:
    from .sampling import EPOCH_SEED, N_EPOCH_SHARDS

    return f"""
{_CC_CHAIN},
{_CLEAN_SQL.strip()},
sharded AS (
  SELECT source, n_tokens, quality_micro,
         CAST(({_SHARD_HEX16}) % {N_EPOCH_SHARDS} AS INTEGER) AS shard
  FROM (SELECT *, md5('{EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)) AS h
        FROM clean)
)
SELECT shard, source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(quality_micro) AS BIGINT) AS sum_quality_micro
FROM sharded GROUP BY shard, source
"""


ORACLE["training_manifest"] = _manifest_oracle()


def curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-stop corpus-health scoreboard — the five counts a curation
    dashboard leads with, each computed by the engine's own audit
    surface and unioned into (metric, value) rows: corpus size, exact-
    duplicate docs (Σ copies beyond the canonical), docs inside a
    near-dup component, split-leaking near-dup pairs, and the docs the
    leakage repair evicts. Every value is a BIGINT count; every
    underlying relation is the same one the standalone query ships, so
    the report can never drift from the audits it summarizes.

    Shape: five independent aggregates, each collapsing to ONE row
    before the union — the report is 5 rows at any corpus size.
    [extension]"""
    from .dedup import dedup_exact
    from .sampling import split_leakage_audit, split_leakage_repair

    def one(name: str, df: DataFrame, value: F.Column) -> DataFrame:
        return df.agg(value.cast("long").alias("value")).select(
            F.lit(name).alias("metric"), "value"
        )

    docs = load_table(spark, sf_dir, "documents")
    parts = [
        one("n_docs", docs, F.count("*")),
        one(
            "exact_dup_docs",
            dedup_exact(spark, sf_dir),
            F.sum(F.col("n_copies") - 1),
        ),
        one(
            "near_dup_member_docs",
            minhash_dup_components(spark, sf_dir),
            F.count("*"),
        ),
        one(
            "leaked_pairs",
            split_leakage_audit(spark, sf_dir).filter(F.col("leaked")),
            F.count("*"),
        ),
        one(
            "evicted_docs",
            split_leakage_repair(spark, sf_dir).filter(F.col("evicted")),
            F.count("*"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


QUERIES["curation_report"] = curation_report


def _curation_report_oracle() -> str:
    from .dedup import ORACLE as _D
    from .sampling import ORACLE as _S

    comps_count = f"""{_CC_CHAIN}
SELECT count(*) AS v FROM comps"""
    return f"""
SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 'exact_dup_docs', CAST(sum(n_copies - 1) AS BIGINT)
FROM ({_D["dedup_exact"]})
UNION ALL
SELECT 'near_dup_member_docs', CAST(v AS BIGINT) FROM ({comps_count})
UNION ALL
SELECT 'leaked_pairs', CAST(count(*) AS BIGINT)
FROM ({_S["split_leakage_audit"]}) WHERE leaked
UNION ALL
SELECT 'evicted_docs', CAST(count(*) AS BIGINT)
FROM ({_S["split_leakage_repair"]}) WHERE evicted
"""


ORACLE["curation_report"] = _curation_report_oracle()
