"""Deduplication operators for LLM training-data pipelines (north-star
extension, BASELINE.json): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
  * exact dedup: hash-groupBy on md5(normalized text) — one shuffle of
    (hash, id), never of the documents themselves.
  * ngram_jaccard_pairs: brute-force pairwise is O(n²) and exists as the
    CORRECTNESS baseline for the LSH path (and the oracle); at scale you run
    minhash_lsh_pairs, which is shuffle-linear: shingle→minhash→band→
    bucket-join, candidates only then verified exactly.
  * the hash family is min over 8-hex-char WINDOWS of
    md5(seed || '|' || shingle) — four md5s sliced into 16 32-bit hashes
    (see _minhash_df) — deliberately engine-neutral (identical in Spark and
    DuckDB), so even the LSH path is fully oracle-checked, not rows-only.
  * simhash: 16-bit per-bit majority over md5-derived shingle hashes; Hamming
    buckets via exact signature match.

Shingling = word 3-grams (distinct) — the standard unit for near-dup detection
(cf. Broder's resemblance / MinHash construction and the GPT-3/C4/RefinedWeb
dedup recipes).
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table

# LSH cost model: candidate-pair mass ∝ Σ_buckets s·(s−1)/2 per band
# (audited before the join by minhash_band_skew_report); detection curve
# P(candidate | jaccard=j) = 1 − (1 − j^BAND_SIZE)^(N_HASHES/BAND_SIZE).
# More bands → higher recall and more candidates to verify; longer bands →
# sharper threshold. 16 hashes / 4-row bands puts the S-curve knee near
# j ≈ 0.5 — re-derive for your corpus's dup profile and τ.
N_HASHES = 16
BAND_SIZE = 4  # → 4 bands; P(candidate) = 1-(1-j^4)^4
JACCARD_THRESHOLD = 0.2  # tuned to the planted near-dups in testdata
# Hot-bucket cap (r8): a (band, sig) bucket of size s contributes s·(s−1)/2
# candidate pairs to the self-join — quadratic IN THE BUCKET by construction.
# On a boilerplate-heavy real corpus one signature can collect 10⁶ docs and
# the join explodes; minhash_band_skew_report MEASURES that mass, this cap
# ENFORCES the bound: buckets larger than LSH_BUCKET_CAP are dropped from
# candidate generation entirely (the winnowing df > 20 / sparse_cosine
# df ≤ 20 precedent). What a mega-bucket holds is either boilerplate (the
# content a curation pipeline handles with boilerplate_strip / line dedup,
# not pairwise near-dedup) or genuine near-dups that other, less-loaded
# bands re-catch — the standard production mitigation (cf. the bucket-size
# ceilings in large-scale MinHash dedup writeups). 32 is ~8× the largest
# testdata bucket at any gate SF (≤4, measured via the skew report), so
# every previously-proven result is bit-identical; the cap is encoded in
# the DuckDB oracle (_CAPPED_BANDS_SQL) so the contract is value-checked,
# and the synthetic mega-bucket test pins the enforcement.
LSH_BUCKET_CAP = 32


def _normalized(col: str = "text") -> F.Column:
    return F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")


def _shingles_df(
    spark: SparkSession,
    sf_dir: str,
    doc_filter: DataFrame | None = None,
    distinct: bool = True,
) -> DataFrame:
    """(doc_id, shingle) — word 3-grams (distinct per doc by default;
    multiset when ``distinct=False``).

    ``doc_filter`` (a 1-column ``doc_id`` relation) semi-joins the documents
    scan BEFORE shingling, so downstream consumers that only need a subset
    (LSH verification needs candidate docs only) pay explode+distinct
    proportional to the subset, not the corpus — at 100 TB verification cost
    must track |candidates|, not |corpus|. The semi-join is UNHINTED: the
    candidate set is ∝ near-dup docs, a corpus fraction on dup-heavy crawls,
    so a forced broadcast would be an OOM ceiling (the r9-verdict hint
    class); AQE picks broadcast at runtime when the filter really is small.

    ``distinct=False`` skips the set semantics entirely (NO shuffle — the
    relation stays in the scan stage): for multiset-insensitive consumers
    (_minhash_df's per-doc MIN aggregates) the distinct's full
    (doc_id, shingle) exchange is pure waste; set-based consumers
    (Jaccard overlap counts) must keep the default.

    Shingle assembly is ``explode(arrays_zip(slice, slice, slice))`` over the
    split words: the zipped trigram array is built once per document inside
    whole-stage codegen and exploded in the same stage as the scan, so the
    ONLY shuffle in the pipeline is the map-side-combined ``distinct``.
    Two rejected alternatives, both measured at sf0.1:
      * explode-words + two ``lead()`` windows — correct, but pays a full
        shuffle+sort of the tokenized corpus by (doc_id, pos) before the
        distinct (2.7s vs 1.1s here);
      * a higher-order ``transform`` lambda — ~10x slower because HOF lambdas
        are interpreted per element and CollapseProject re-inlines the split
        into every array reference (22s).
    """
    docs = load_table(spark, sf_dir, "documents")
    if doc_filter is not None:
        docs = docs.join(doc_filter, "doc_id", "left_semi")
    base = docs.select("doc_id", F.split("text", " ").alias("ws"))
    n = F.greatest(F.size("ws") - 2, F.lit(0))
    tri = F.arrays_zip(
        F.slice("ws", 1, n), F.slice("ws", 2, n), F.slice("ws", 3, n)
    )
    out = base.select("doc_id", F.explode(tri).alias("g")).select(
        "doc_id",
        F.concat_ws(" ", F.col("g.0"), F.col("g.1"), F.col("g.2")).alias("shingle"),
    )
    return out.distinct() if distinct else out


# --- exact dedup -------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5 of normalized text → (hash, canonical doc,
    n_copies). Canonical survivor pinned to min doc_id (deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(_normalized()).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus: one survivor row per distinct normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    w_min = F.min("doc_id").over(Window.partitionBy(F.md5(_normalized())))
    return (
        docs.withColumn("keep", F.col("doc_id") == w_min)
        .filter("keep")
        .select("doc_id", "lang", "source", "n_chars")
    )


# --- brute-force n-gram Jaccard (correctness baseline) ----------------------
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with 3-gram Jaccard ≥ τ, via shingle-inverted-index self-join
    (only docs sharing ≥1 shingle are compared — still quadratic in the worst
    case; the LSH variant below is the scale path)."""
    sh = _shingles_df(spark, sf_dir)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- MinHash + LSH (the scale path) -----------------------------------------
_MINHASH_SEEDS = "abcd"  # one md5 per seed; 4 × 8-hex-char windows each


def _minhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h0..h15): minhash_{4a+j} = min over shingles of the j-th
    8-hex-char window of md5(seed_a || '|' || s) — 16 32-bit hash
    functions from FOUR md5 evaluations per shingle, not sixteen
    (slicing one wide hash into independent windows is the standard
    one-permutation economy; md5 bits are uniform, and 32-bit windows
    over ~10^5–10^9 distinct shingles keep min-collisions negligible).
    The md5s are projected BEFORE the groupBy so each evaluates once per
    (doc, shingle) row; the min-aggs see only cheap substrings. Measured
    1.92 s → 0.7 s for the signature build at sf0.1, and band signatures
    shrink 4× (32 chars, not 128), cutting the self-join shuffle bytes.
    Hex-string min is engine-neutral (fixed-width lowercase hex sorts
    identically in Spark and DuckDB).

    The shingle relation is consumed WITHOUT the distinct (r10): MIN is
    multiset-insensitive, so the set semantics buy nothing here while the
    distinct costs a full (doc_id, shingle) exchange BEFORE the signature
    groupBy — dropping it leaves ONE shuffle whose map-side partial mins
    collapse each partition's rows to 16 hex values per doc. Identical
    signatures (hash-proven against the distinct-based oracle); the
    Jaccard verification paths keep distinct shingles."""
    sh = _shingles_df(spark, sf_dir, distinct=False)
    proj = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle"))).alias(f"m{a}")
            for a, s in enumerate(_MINHASH_SEEDS)
        ],
    )
    aggs = [
        F.min(F.substring(F.col(f"m{a}"), 1 + 8 * j, 8)).alias(f"h{4 * a + j}")
        for a in range(len(_MINHASH_SEEDS))
        for j in range(4)
    ]
    return proj.groupBy("doc_id").agg(*aggs)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expose the signature matrix itself (first 4 hashes) — a checkable
    sample of the sketch state."""
    mh = _minhash_df(spark, sf_dir)
    return mh.select("doc_id", "h0", "h1", "h2", "h3")


# --- staged intermediate relations -------------------------------------------
# The LSH candidate set and the verified pair set are deterministic per
# (application, shuffle-partitions conf, sf_dir) and consumed by MANY
# downstream queries (verification, precision/recall eval, components,
# survivors, soft weights, pagerank, triangles, source matrix, leakage
# repair) — at 100 TB each would be a staged table between pipeline stages,
# not a subplan recomputed per consumer. _staged() is the runtime analog:
# build once, persist(), memoize the handle. persist — NOT
# localCheckpoint(eager=False): under AQE a "lazy" checkpoint still
# materializes every upstream shuffle stage at CONSTRUCTION time (only the
# final stage defers), which would break the job-free plan-construction pin
# (test_lsh_band_checkpoint_is_lazy); persist is truly lazy — the first
# action fills the cache, every later consumer reads InMemoryTableScan. The
# cached relations are id-pair/id-label sized, never text-bearing.
# applicationId (not id(spark)) so a recycled object address can never
# serve a dead plan.
_RELATION_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def clear_staged_memo() -> None:
    """Unpersist and forget every staged relation.

    Callers that need two INDEPENDENT computations of a staged relation —
    the 32-vs-7 shuffle-partitions determinism sweep, bench.py's
    cold-pass timing of staged queries — call this between runs. The
    memo key deliberately does NOT encode any session conf (see _staged),
    so an explicit clear is the one way to force a rebuild."""
    for df in _RELATION_MEMO.values():
        try:
            df.unpersist()
        except Exception:
            pass  # a stopped session can't unpersist; dropping the ref suffices
    _RELATION_MEMO.clear()
    _COMPONENTS_MEMO.clear()  # eager localCheckpoints: dropping refs suffices


def _staged(name: str, spark: SparkSession, sf_dir: str, build) -> DataFrame:
    """Memoized persist() of a deterministic intermediate relation.

    Keyed on relation IDENTITY only — (name, applicationId, sf_dir). The
    r8 key additionally carried spark.sql.shuffle.partitions, which the
    r8 ADVICE flagged as a cross-filing hazard: Spark resolves that conf
    at the FIRST ACTION, not at plan construction, so a handle built
    under conf A whose first action ran under conf B cached B-results
    under A's key — correctness rested on a calling convention enforced
    only by prose. With the conf out of the key there is nothing to
    cross-file: every staged relation is partitioning-independent by
    construction (pinned in test_determinism), so whichever conf fills
    the cache, the values ARE the relation. Sweeps that need independent
    recomputations call clear_staged_memo() explicitly instead of
    relying on key divergence."""
    key = (name, spark.sparkContext.applicationId, sf_dir)
    df = _RELATION_MEMO.get(key)
    if df is None:
        df = build().persist()
        _RELATION_MEMO[key] = df
    return df


def _lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate pairs (doc_a < doc_b), pre-verification — the
    shared front half of minhash_lsh_pairs and lsh_eval_precision_recall.
    Staged (persist + memo) so the two consumers share one computation
    per session."""
    return _staged(
        "lsh_candidates",
        spark,
        sf_dir,
        lambda: _build_lsh_candidates(spark, sf_dir),
    )


def _band_structs() -> F.Column:
    """Array of (band, sig) structs over the h0..h15 signature columns —
    one explode turns a signature row into its banded form (shared by the
    candidate builder, the skew/cap reports, and the incremental path)."""
    return F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    "",
                    *[f"h{band * BAND_SIZE + j}" for j in range(BAND_SIZE)],
                ).alias("sig"),
            )
            for band in range(N_HASHES // BAND_SIZE)
        ]
    )


def _build_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    mh = _minhash_df(spark, sf_dir)
    # All bands in ONE pass over the signature matrix: explode an array of
    # (band, sig) structs instead of a 4-way union — the union form recomputes
    # the whole shingle→minhash pipeline once per band AND once per self-join
    # side; the explode form makes both join inputs byte-identical subplans so
    # ReuseExchange materializes the band table once (measured 6.9s → see
    # PERFORMANCE.md).
    band_structs = _band_structs()
    # eager=False: merely CONSTRUCTING this DataFrame (queries() enumeration,
    # explain()) must not run Spark jobs; the band table materializes at the
    # first action and is reused by both join sides from then on.
    all_bands = mh.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    ).localCheckpoint(eager=False)
    # Hot-bucket cap: buckets above LSH_BUCKET_CAP never enter the self-join
    # (see the constant's rationale). Shape: one (band, sig)-keyed count
    # aggregate over the materialized band table — map-side combined, its
    # output is |buckets over the cap| rows — then an ANTI join, strategy
    # left to AQE (r12, de-hinted): on a duplicate-light corpus the hot set
    # is ≈ empty and AQE broadcasts it at runtime; on a dedup-heavy crawl
    # every cluster > cap mints a hot bucket per band, so the relation's
    # worst case is n_bands·|corpus|/cap keys — corpus-LINEAR — and a
    # forced broadcast is a driver OOM at the 100 TB design point (the
    # same class as the corpus-fraction hints r9/r10 removed and the dim
    # hints r11 removed). Unhinted, the fallback is a shuffle anti-join on
    # (band, sig) — the band table re-partitions on exactly the keys the
    # candidate self-join needs next, so the exchange is not wasted.
    # This beats the window-count alternative either way (that form sorts
    # the whole band table inside the (band, sig) exchange).
    hot = (
        all_bands.groupBy("band", "sig")
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") > LSH_BUCKET_CAP)
        .select("band", "sig")
    )
    capped = all_bands.join(hot, ["band", "sig"], "left_anti")
    l = capped.alias("l")
    r = capped.alias("r")
    # The band table is materialized above (localCheckpoint — the runtime
    # analog of staging the sketch as a table at cluster scale), so the
    # candidate self-join below is cheap to reference from BOTH its
    # consumers (the verification join input and the semi-filter's doc set);
    # without any materialization, pushing the candidate filter into the
    # shingle subplans re-runs the whole minhash pipeline once per
    # verification side (measured 2x worse — PERFORMANCE.md).
    candidates = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return candidates


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate generation + exact verification:
       band signature = concat of BAND_SIZE minhashes → hot-bucket cap
       (buckets > LSH_BUCKET_CAP dropped) → bucket-join within a band →
       distinct candidate pairs → verify true Jaccard ≥ τ.
    Every step is an equi-shuffle; nothing is quadratic in corpus size —
    the cap bounds the one residual quadratic term (within-bucket pairs).
    Staged (persist + memo): the verified pair set feeds components,
    survivors, pagerank, triangles, the source matrix, and leakage repair —
    one computation per session serves them all."""
    return _staged(
        "minhash_lsh_pairs",
        spark,
        sf_dir,
        lambda: _build_minhash_lsh_pairs(spark, sf_dir),
    )


def _candidate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_inter, na, nb) exact shingle-overlap counts for every
    LSH candidate pair — the shared sufficient statistics for BOTH set
    resemblances this module verifies candidates with (Jaccard and Broder
    containment). Staged (persist + memo) like the relations it sits
    between."""
    return _staged(
        "candidate_overlap",
        spark,
        sf_dir,
        lambda: _build_candidate_overlap(spark, sf_dir),
    )


def _build_candidate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    candidates = _lsh_candidates(spark, sf_dir)
    # exact verification of candidates only: the shingle relation is
    # semi-filtered to candidate docs (explode+distinct ∝ |candidates|, see
    # _shingles_df), and the set-size denominators are counted from that SAME
    # filtered relation (the doc_id filter commutes with the distinct, so the
    # counts are exact totals) — the full-corpus minhash aggregation runs
    # exactly once, in the candidates job above.
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select("doc_b"))
        .distinct()
    )
    sh = _shingles_df(spark, sf_dir, doc_filter=cand_docs)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return inter.join(ca, "doc_a").join(cb, "doc_b").select(
        "doc_a", "doc_b", "n_inter", "na", "nb"
    )


def _build_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    overlap = _candidate_overlap(spark, sf_dir)
    jac = F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        overlap.withColumn("jaccard", jac)
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def lsh_eval_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-quality eval for the banded-LSH near-dedup path: one row of
    (n_truth, n_candidates, n_hits, lsh_recall, candidate_precision) where
    truth = exact 3-gram Jaccard ≥ τ pairs (the O(n²)-style baseline that
    exists precisely to score this) and hits = truth ∩ LSH candidates. This
    is the dial a corpus owner reads before trusting LSH at a scale where
    the exact baseline is unrunnable — same harness shape as
    retrieval_eval_recall / pq_eval_recall on the ANN side.

    Scale: reuses the banded candidate join (shuffle-linear) and the
    inverted-index truth join; the three counts are 1-row aggregates
    broadcast-crossed, nothing returns to the driver until the single
    result row."""
    truth = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cand = _lsh_candidates(spark, sf_dir)
    hits = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nh = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        nt.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nh))
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_truth")).alias(
                "lsh_recall"
            ),
            (F.col("n_hits").cast("double") / F.col("n_candidates")).alias(
                "candidate_precision"
            ),
        )
    )


INCR_MOD = 10  # doc_id % INCR_MOD == INCR_REM → the "incoming batch"
INCR_REM = 7


def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup: classify an INCOMING batch (a deterministic
    id-slice standing in for today's crawl) against the EXISTING corpus by
    normalized-text hash — the incremental shape production pipelines run
    per batch, where re-hashing the whole corpus (dedup_exact) would be
    quadratic over time. One hash aggregate per side, then a batch-sized
    left join against the corpus' distinct hashes: at 100 TB the corpus
    hash set is a pre-materialized index and the per-batch cost is
    |batch|, not |corpus|."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % INCR_MOD == INCR_REM
    h = F.md5(_normalized())
    corpus_hashes = (
        docs.filter(~is_new).select(h.alias("text_hash")).distinct()
    )
    batch = docs.filter(is_new).select(
        "doc_id", "lang", "source", h.alias("text_hash")
    )
    return batch.join(
        corpus_hashes.withColumn("seen", F.lit(1)), "text_hash", "left"
    ).select(
        "doc_id",
        "lang",
        "source",
        (F.col("seen").isNotNull()).alias("is_duplicate"),
    )


# stored-index twin of the exact incremental path (r9): the docstring above
# has always declared "at 100 TB the corpus hash set is a pre-materialized
# index" — this is that form, completing the stored-index family (exact,
# MinHash, semantic, decontamination all have one now). Cache keying,
# invalidation, and table-tag hygiene live in indexcache (r9-ADVICE fix).
def _ensure_exact_hash_index(spark: SparkSession, sf_dir: str) -> str:
    """Write the corpus' distinct normalized-text hash set as a bucketed,
    sorted table on text_hash, once per (session, corpus) — the nightly
    index job."""
    from . import indexcache

    t = f"exact_hash_idx_{indexcache.table_tag(sf_dir)}"

    def build() -> str:
        indexcache.drop_table(spark, t)
        docs = load_table(spark, sf_dir, "documents")
        is_new = F.col("doc_id") % INCR_MOD == INCR_REM
        (
            docs.filter(~is_new)
            .select(F.md5(_normalized()).alias("text_hash"))
            .distinct()
            .write.mode("overwrite")
            .bucketBy(8, "text_hash")
            .sortBy("text_hash")
            .saveAsTable(t)
        )
        return t

    return indexcache.get_or_build(spark, "exact_hash_idx", sf_dir, build)


def incremental_dedup_indexed(
    spark: SparkSession, sf_dir: str, batch_cap: int | None = None
) -> DataFrame:
    """incremental_dedup_new_docs against the PRE-MATERIALIZED corpus hash
    index (same output, same oracle): the per-batch plan hashes the batch
    slice only (the filter pushes to the documents scan) and left-joins
    the bucketed hash index — no exchange and no sort on the index side,
    no corpus text read at all. Per-batch cost ∝ |batch|; the index is a
    compact single-column table maintained by appending each accepted
    batch's new hashes. ``batch_cap`` is the tools_scale_study fixed-batch
    hook (not registered). [extension]"""
    t = _ensure_exact_hash_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % INCR_MOD == INCR_REM
    if batch_cap is not None:
        is_new = is_new & (F.col("doc_id") < batch_cap)
    batch = docs.filter(is_new).select(
        "doc_id", "lang", "source", F.md5(_normalized()).alias("text_hash")
    )
    idx = spark.table(t).withColumn("seen", F.lit(1))
    return batch.join(idx, "text_hash", "left").select(
        "doc_id",
        "lang",
        "source",
        (F.col("seen").isNotNull()).alias("is_duplicate"),
    )


def incremental_minhash_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time NEAR-dedup: the incoming batch (the same deterministic
    id-slice incremental_dedup_new_docs uses) LSH-matched against the
    EXISTING corpus — the incremental form production pipelines actually
    run per crawl (the full self-join re-runs O(corpus) work per day; this
    runs O(batch) against a pre-built index). Exact-hash incremental dedup
    (incremental_dedup_new_docs) catches byte-identical re-crawls; this
    catches the near-duplicates. Output: (doc_id, dup_of_doc_id, jaccard)
    — each new doc paired with every existing near-duplicate, verified
    exactly.

    Scale shape: ONE banded equi-join of batch bands against corpus bands
    (cost ∝ batch × bucket occupancy, hot buckets excluded by the same
    LSH_BUCKET_CAP — computed over the full band table, so enforcement is
    identical to the batch-build path); verification is semi-filtered to
    candidate docs, ∝ |candidates|. At 100 TB the corpus band table and
    hot-bucket set are pre-materialized index tables; the per-batch cost
    never touches corpus size. The signature build here recomputes per
    call (batch + corpus in one pass) — the production form reads the
    stored index; the JOIN SHAPE, cap semantics, and verification are the
    operator under test. [extension]"""
    mh = _minhash_df(spark, sf_dir)
    bands = mh.select("doc_id", F.explode(_band_structs()).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    ).localCheckpoint(eager=False)
    hot = (
        bands.groupBy("band", "sig")
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") > LSH_BUCKET_CAP)
        .select("band", "sig")
    )
    # unhinted (r12): the hot set is corpus-linear in the worst case —
    # AQE broadcasts it where it fits, shuffle anti-join where it doesn't
    capped = bands.join(hot, ["band", "sig"], "left_anti")
    is_new = F.col("doc_id") % INCR_MOD == INCR_REM
    batch = capped.filter(is_new).select(
        F.col("doc_id").alias("new_id"), "band", "sig"
    )
    corpus = capped.filter(~is_new).select(
        F.col("doc_id").alias("old_id"), "band", "sig"
    )
    cands = (
        batch.join(corpus, ["band", "sig"])
        .select("new_id", "old_id")
        .distinct()
    )
    cand_docs = (
        cands.select(F.col("new_id").alias("doc_id"))
        .union(cands.select("old_id"))
        .distinct()
    )
    sh = _shingles_df(spark, sf_dir, doc_filter=cand_docs)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("new_id"), "shingle")
    sb = sh.select(F.col("doc_id").alias("old_id"), "shingle")
    inter = (
        cands.join(sa, "new_id")
        .join(sb, ["old_id", "shingle"])
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("new_id"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("old_id"), F.col("n_sh").alias("nb"))
    jac = F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(ca, "new_id")
        .join(cb, "old_id")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(
            F.col("new_id").alias("doc_id"),
            F.col("old_id").alias("dup_of_doc_id"),
            jac.alias("jaccard"),
        )
    )


# --- stored-index incremental near-dedup (r9) ---------------------------------
# incremental_minhash_new_docs proves the per-batch JOIN SHAPE but rebuilds
# the corpus band table per call; this is the production twin the r8 verdict
# named: the corpus band table is a BUCKETED, SORTED parquet table keyed on
# (band, sig) — written once at index-build time, exchange-free at query
# time — and the hot-bucket set is a second (tiny) stored table. Per-batch
# work is then: batch-only signature build (the batch filter pushes below
# the aggregate to the scan) + an unhinted anti-join against the stored hot
# set (r12: strategy left to AQE — broadcast when the stored set is small,
# shuffle when a dedup-heavy corpus has grown it) + one equi-join against
# the bucketed index (the index side needs NO exchange and NO sort — Spark
# plans a shuffle of the batch side only) + candidate-filtered
# verification. The corpus TEXT pipeline never runs.
def _ensure_lsh_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write the corpus-side LSH band index (bucketed on (band, sig)) and
    the corpus hot-bucket table, once per (session, corpus). At 100 TB
    this is the nightly index-build job; the per-batch query below never
    recomputes it."""
    from . import indexcache

    tag = indexcache.table_tag(sf_dir)
    bt, ht = f"lsh_band_idx_{tag}", f"lsh_hot_idx_{tag}"

    def build() -> tuple[str, str]:
        for t in (bt, ht):
            indexcache.drop_table(spark, t)
        is_new = F.col("doc_id") % INCR_MOD == INCR_REM
        corpus_bands = (
            _minhash_df(spark, sf_dir)
            .filter(~is_new)  # pushes below the signature agg to the scan
            .select("doc_id", F.explode(_band_structs()).alias("bs"))
            .select(
                "doc_id",
                F.col("bs.band").alias("band"),
                F.col("bs.sig").alias("sig"),
            )
        )
        corpus_bands.write.mode("overwrite").bucketBy(
            8, "band", "sig"
        ).sortBy("band", "sig").saveAsTable(bt)
        (
            spark.table(bt)
            .groupBy("band", "sig")
            .agg(F.count("*").alias("s"))
            .filter(F.col("s") > LSH_BUCKET_CAP)
            .select("band", "sig")
            .write.mode("overwrite")
            .saveAsTable(ht)
        )
        return bt, ht

    return indexcache.get_or_build(spark, "lsh_band_idx", sf_dir, build)


def _indexed_candidates(
    spark: SparkSession, sf_dir: str, batch_cap: int | None = None
) -> DataFrame:
    """(new_id, old_id) candidate pairs of the stored-index path, BEFORE
    the localCheckpoint barrier — split out so the plan pin can assert
    the candidate subplan's properties (index scan, batch-only signature
    build), which a lazy checkpoint hides from downstream explains."""
    bt, ht = _ensure_lsh_index(spark, sf_dir)
    is_new = F.col("doc_id") % INCR_MOD == INCR_REM
    if batch_cap is not None:
        is_new = is_new & (F.col("doc_id") < batch_cap)
    batch_bands = (
        _minhash_df(spark, sf_dir)
        .filter(is_new)
        .select("doc_id", F.explode(_band_structs()).alias("bs"))
        .select(
            "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
        )
    )
    hot = spark.table(ht)
    # unhinted (r12): the stored hot set scales with corpus duplication —
    # AQE picks broadcast wherever it fits; never force it from the driver
    batch_capped = batch_bands.join(hot, ["band", "sig"], "left_anti")
    corpus_bands = spark.table(bt)
    return (
        batch_capped.select(F.col("doc_id").alias("new_id"), "band", "sig")
        .join(
            corpus_bands.select(F.col("doc_id").alias("old_id"), "band", "sig"),
            ["band", "sig"],
        )
        .select("new_id", "old_id")
        .distinct()
    )


def incremental_minhash_indexed(
    spark: SparkSession, sf_dir: str, batch_cap: int | None = None
) -> DataFrame:
    """Stored-index incremental NEAR-dedup: the per-batch production form
    of incremental_minhash_new_docs. The corpus band table and hot-bucket
    set are PRE-MATERIALIZED (bucketed parquet via _ensure_lsh_index);
    the per-batch plan builds signatures for BATCH docs only (the slice
    filter pushes below the minhash aggregate into the documents scan),
    anti-joins the stored hot set, equi-joins the bucketed index with no
    exchange and no sort on the index side, and verifies exact Jaccard
    over candidate docs only. Per-batch shuffle + verification cost is
    ∝ batch and ∝ candidates; the only corpus-sized touch is the
    exchange-free columnar scan of the compact (doc_id, band, sig) index
    — corpus TEXT is read only for candidate old docs, via the
    verification semi-filter. Cap semantics: hot buckets are defined by
    CORPUS occupancy alone (an index built last night cannot know
    today's batch) — the one intended semantic difference from the
    rebuild-per-call twin, mirrored in the oracle.

    ``batch_cap`` (tooling only, not registered): additionally bounds
    the batch to doc_id < batch_cap so tools_scale_study can grow the
    corpus x1→x8 at FIXED batch size — the flat-runtime proof behind
    the per-batch cost claim. [extension]"""
    # eager=False: construction stays job-free; the candidate relation
    # (id pairs, ∝ batch) materializes at the first action and is reused
    # by all three verification consumers — without this the batch
    # signature build and the index join replicate once per consumer
    cands = _indexed_candidates(spark, sf_dir, batch_cap).localCheckpoint(
        eager=False
    )
    cand_docs = (
        cands.select(F.col("new_id").alias("doc_id"))
        .union(cands.select("old_id"))
        .distinct()
    )
    sh = _shingles_df(spark, sf_dir, doc_filter=cand_docs)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("new_id"), "shingle")
    sb = sh.select(F.col("doc_id").alias("old_id"), "shingle")
    inter = (
        cands.join(sa, "new_id")
        .join(sb, ["old_id", "shingle"])
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("new_id"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("old_id"), F.col("n_sh").alias("nb"))
    jac = F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(ca, "new_id")
        .join(cb, "old_id")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(
            F.col("new_id").alias("doc_id"),
            F.col("old_id").alias("dup_of_doc_id"),
            jac.alias("jaccard"),
        )
    )


def near_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: verified near-dup pairs bucketed
    by (source of A, source of B) — the report that tells a curation team
    WHERE duplication comes from (mirror sites, cross-posted feeds) before
    they decide which source to drop. Pure composition: the LSH pair
    relation joined twice against the doc dimension, then a 2-key count —
    pairs are tiny relative to the corpus, so both dimension joins
    broadcast the pair side at scale."""
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
    )


# --- dup-group resolution: distributed connected components ------------------
_CC_MAX_ITER = 25

# The resolved component relation is deterministic per (session, sf_dir) and
# already MATERIALIZED (the CC loop localCheckpoints each iterate), yet every
# consumer — dup groups, survivors, soft-dedup weights, cluster histogram,
# the corpus pipeline, the training manifest — used to re-run the whole
# LSH + iterative-CC resolution from scratch. Memoize the checkpointed result
# per (session, sf_dir): the runtime analog of staging the resolution as a
# table, which is exactly what a 100 TB deployment does (the docstring below
# has always said so). Results are unchanged — consumers receive the same
# immutable DataFrame they previously recomputed.
_COMPONENTS_MEMO: dict[tuple[str, str], DataFrame] = {}


def minhash_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component) for every doc in ≥1 verified LSH pair; component =
    min doc_id transitively reachable (the canonical survivor of the group).

    Near-dup pairs are not transitive (A~B, B~C does not imply A~C), so a real
    dedup pipeline must resolve the pair graph into clusters before it can pick
    survivors. This is iterative min-label propagation — the DataFrame form of
    connected components (cf. the large-star/small-star formulation of
    Kiveris et al., "Connected Components in MapReduce and Beyond"):

      * each iteration is one equi-join (labels onto edge endpoints) + one
        min-aggregation — shuffle-linear in |edges|, nothing quadratic;
      * iterations needed = graph diameter, and near-dup clusters are
        shallow (dozens of docs, diameter ≲ 3), not web-graph-deep;
      * ``localCheckpoint`` truncates lineage each round so the plan does not
        grow with the iteration count (same idiom as clustering.kmeans_fit);
      * only (doc_id, component) pairs cross iterations — never documents.

    The driver's correctness gate covers this via a DuckDB recursive-CTE
    oracle (transitive closure), so the iterative path is value-checked, not
    rows-only. Replaces the reference's nothing — it has no dedup at all;
    this is the north-star LLM-data extension (BASELINE.json).
    """
    # applicationId (not id(spark)) so a recycled object address after a
    # stopped session can never serve a dead checkpointed plan. Identity-
    # only key (r9, same contract as _staged): the resolution here is
    # EAGER (localCheckpoint per round), so whichever conf is current at
    # the call materializes the labels; determinism sweeps force an
    # independent re-resolution via clear_staged_memo(), not key
    # divergence.
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    memoized = _COMPONENTS_MEMO.get(memo_key)
    if memoized is not None:
        return memoized
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select("doc_b", "doc_a"))
        .toDF("src", "dst")
        .localCheckpoint()
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .select(
            F.col("src").alias("doc_id"),
            F.least("src", "m").alias("component"),
        )
        .localCheckpoint()
    )
    converged = False
    for _ in range(_CC_MAX_ITER):
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("component").alias("c")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("c").alias("nc"))
            .select(F.col("src").alias("doc_id"), "nc")
        )
        # The convergence signal rides along in the SAME update join (a
        # per-row `new < old` flag) — checking it is a filter over the
        # checkpointed result, not a second labels⋈labels join per round.
        new_labels = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    "component", F.coalesce("nc", "component")
                ).alias("component"),
                F.coalesce(
                    F.col("nc") < F.col("component"), F.lit(False)
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        converged = new_labels.filter("_changed").isEmpty()
        labels = new_labels.drop("_changed")
        if converged:
            break
    if not converged:
        # A dup-chain with min-label eccentricity > _CC_MAX_ITER would yield
        # silently-wrong components (and silent divergence from the
        # transitive-closure oracle) — fail loud instead.
        raise RuntimeError(
            f"connected-components did not converge in {_CC_MAX_ITER} "
            "iterations; raise _CC_MAX_ITER for this graph"
        )
    _COMPONENTS_MEMO[memo_key] = labels
    return labels


def minhash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: one row per component with its size."""
    comp = minhash_dup_components(spark, sf_dir)
    return comp.groupBy(F.col("component").alias("canonical_doc_id")).agg(
        F.count("*").alias("n_docs")
    )


def minhash_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dedup'd corpus: drop every non-canonical member of a
    component (anti-join — the documents themselves are never shuffled)."""
    comp = minhash_dup_components(spark, sf_dir)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


# --- SimHash -----------------------------------------------------------------
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per-bit majority vote over md5-derived shingle hashes.
    conv(hex[..4], 16, 10) gives a 16-bit int per shingle; bit b of the
    signature is 1 iff more shingles have bit b set than not."""
    sh = _shingles_df(spark, sf_dir)
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 4), 16, 10).cast("long").alias("h"),
    )
    bit_sums = hashed.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(16)
        ],
    )
    sig = None
    for b in range(16):
        bit = (F.col(f"b{b}") * 2 > F.col("n")).cast("long") * (1 << b)
        sig = bit if sig is None else sig + bit
    return bit_sums.select("doc_id", sig.alias("simhash"))


def simhash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing an identical 16-bit simhash (Hamming distance 0 buckets)."""
    s = simhash_signatures(spark, sf_dir)
    return (
        s.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


SPAN_L = 4  # minimum duplicated run, in tokens (Lee et al. use 50 BPE
# tokens on web corpora; 4 matches this testdata's short synthetic docs,
# same tuning note as BOILER_N)


def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring deduplication, the Lee et al. 2022 operator
    ("Deduplicating Training Data Makes Language Models Better"): find every
    MAXIMAL token span of length ≥ SPAN_L whose every SPAN_L-gram occurs
    more than once in the corpus — the spans a substring-dedup pass would
    cut before training. The paper's suffix array is replaced by the
    equivalent-for-fixed-L formulation: position-indexed L-grams →
    corpus-wide occurrence counts → duplicated positions → gaps-and-islands
    merge into maximal spans (pos − row_number() grouping).

    Scale shape: one gram-count aggregate (hash-partitioned on the gram,
    map-side partial counts), one equi-join back (same key), one per-doc
    window — all linear; a suffix array's O(n log n) global sort is never
    needed for fixed minimum length. Output is integers only (token
    indices + counts): value-level oracle-checked.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).withColumn("n", F.size("ws"))
    grams = (
        base.filter(F.col("n") >= SPAN_L)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - F.lit(SPAN_L - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(
                            " ", F.slice("ws", i, F.lit(SPAN_L))
                        ).alias("gram"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )
    # Duplicated positions via ONE pass over the gram table (r14): a
    # count window keyed on the gram replaces the former
    # groupBy(gram)-count + equi-join-back pair. The agg+join form
    # computed the gram explode TWICE (once per subplan side) and
    # shuffled the gram strings twice at scale (partial counts barely
    # collapse — corpus grams are mostly unique — and the join-back
    # re-shuffles the full gram table); the window form explodes once and
    # shuffles once, with (doc_id, pos) riding along. Same rows out:
    # positions whose gram occurs ≥ 2 times corpus-wide.
    wg = Window.partitionBy("gram")
    hits = (
        grams.withColumn("cnt", F.count("*").over(wg))
        .filter(F.col("cnt") >= 2)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        islands.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(SPAN_L - 1)).alias("span_end"),
            F.count("*").alias("n_dup_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_dup_grams")
    )


def substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The act step behind duplicate_spans (Lee et al. 2022 §4: cut every
    duplicated substring occurrence but one): spans with identical token
    content are grouped, the globally-first occurrence (min (doc_id,
    span_start)) is the canonical keeper, every other occurrence is cut
    from its document and the text reassembled. Operates on the MAXIMAL
    spans duplicate_spans emits — a span must repeat verbatim to be cut
    (embedded-in-longer-span copies stay; documented simplification of the
    paper's per-substring rule, same flavor as their ExactSubstr tool
    keeping one member per duplicate cluster). Cut positions are the UNION
    over a doc's non-canonical spans (islands of gram starts closer than
    SPAN_L overlap in token coverage), so an overlapping cut may clip a
    canonical neighbor — like byte-range cutting in the paper's tool; both
    the union accounting and content survival are pinned in
    tests/test_exact_properties.py.

    Scale shape: the covered-position relation is ∝ duplicated spans — a
    corpus FRACTION on dup-heavy crawls, with the heaviest per-row payload
    in the module (integer position sets) — so the join back onto the
    corpus scan is UNHINTED (the r9-verdict broadcast class): AQE
    broadcasts it at runtime when duplication is light and falls back to
    a doc_id shuffle join when it is not. The canonical choice is a
    window over the span table, never the corpus; the rewrite is one
    per-word filter against the doc's own covered-position set."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split("text", " ").alias("ws"))
    spans = duplicate_spans(spark, sf_dir)
    content = spans.join(base, "doc_id").select(
        "doc_id",
        "span_start",
        "span_end",
        F.concat_ws(
            " ",
            F.slice(
                "ws",
                F.col("span_start"),
                F.col("span_end") - F.col("span_start") + F.lit(1),
            ),
        ).alias("span_text"),
    )
    w = Window.partitionBy("span_text").orderBy("doc_id", "span_start")
    cuts = (
        content.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id", "span_start", "span_end")
    )
    covered = (
        cuts.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("span_start"), F.col("span_end"))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("covered"))
    )
    j = base.join(covered, "doc_id", "left")
    kept = F.filter(
        "ws",
        lambda word, i: ~F.coalesce(
            F.array_contains("covered", i + 1), F.lit(False)
        ),
    )
    return j.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        (F.size("ws") - F.size(kept)).alias("n_removed"),
        F.concat_ws(" ", kept).alias("deduped_text"),
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_exact_survivors": dedup_exact_survivors,
    "incremental_dedup_new_docs": incremental_dedup_new_docs,
    "incremental_minhash_new_docs": incremental_minhash_new_docs,
    "incremental_minhash_indexed": incremental_minhash_indexed,
    "incremental_dedup_indexed": incremental_dedup_indexed,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "lsh_eval_precision_recall": lsh_eval_precision_recall,
    "near_dup_source_matrix": near_dup_source_matrix,
    "minhash_dup_components": minhash_dup_components,
    "minhash_dup_groups": minhash_dup_groups,
    "minhash_dedup_survivors": minhash_dedup_survivors,
    "simhash_signatures": simhash_signatures,
    "simhash_dup_groups": simhash_dup_groups,
    "duplicate_spans": duplicate_spans,
    "substring_dedup_rewrite": substring_dedup_rewrite,
}

_SHINGLES_SQL = """
shingles AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1] || ' ' ||
                       string_split(text, ' ')[i+2])) AS sh
    FROM documents
  )
)
"""

_MINHASH_SQL = (
    "minhash AS (\n  SELECT doc_id, "
    + ", ".join(
        f"min(substring(md5('{s}|' || sh), {1 + 8 * j}, 8)) AS h{4 * a + j}"
        for a, s in enumerate(_MINHASH_SEEDS)
        for j in range(4)
    )
    + "\n  FROM shingles GROUP BY doc_id\n)"
)

_BANDS_SQL = (
    "bands AS (\n"
    + "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {band} AS band, "
        + " || ".join(f"h{band * BAND_SIZE + j}" for j in range(BAND_SIZE))
        + " AS sig FROM minhash"
        for band in range(N_HASHES // BAND_SIZE)
    )
    + "\n)"
)

# Candidate generation with the hot-bucket cap (mirror of
# _build_lsh_candidates): buckets larger than LSH_BUCKET_CAP are excluded
# before the self-join. `bands` itself stays raw — minhash_band_skew_report
# audits the UNCAPPED load, which is the number that tells an operator the
# cap is doing work.
_CAPPED_BANDS_SQL = f"""capped_bands AS (
  SELECT doc_id, band, sig FROM (
    SELECT doc_id, band, sig,
           count(*) OVER (PARTITION BY band, sig) AS bsz
    FROM bands
  ) WHERE bsz <= {LSH_BUCKET_CAP}
)"""

_PAIRS_SQL = """pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM capped_bands l JOIN capped_bands r
    ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
)"""

_JACCARD_TAIL = f"""
counts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
  FROM pairs p
  JOIN shingles a ON a.doc_id = p.doc_a
  JOIN shingles b ON b.doc_id = p.doc_b AND b.sh = a.sh
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN counts ca ON ca.doc_id = i.doc_a
JOIN counts cb ON cb.doc_id = i.doc_b
WHERE i.n_inter * 1.0 / (ca.n_sh + cb.n_sh - i.n_inter) >= {JACCARD_THRESHOLD}
"""

# Verified pairs + transitive closure (recursive CTE) — the oracle for the
# iterative connected-components path. `reach` is seeded with the directed
# edge set (both directions), so min(dst) over reach ∪ {src} is exactly the
# min doc_id in src's component.
_COMPONENTS_SQL = f"""
jcounts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
jinter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
  FROM pairs p
  JOIN shingles a ON a.doc_id = p.doc_a
  JOIN shingles b ON b.doc_id = p.doc_b AND b.sh = a.sh
  GROUP BY p.doc_a, p.doc_b
),
jpairs AS (
  SELECT i.doc_a, i.doc_b
  FROM jinter i
  JOIN jcounts ca ON ca.doc_id = i.doc_a
  JOIN jcounts cb ON cb.doc_id = i.doc_b
  WHERE i.n_inter * 1.0 / (ca.n_sh + cb.n_sh - i.n_inter) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jpairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM jpairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
comps AS (
  SELECT src AS doc_id, least(src, min(dst)) AS component
  FROM reach GROUP BY src
)
"""

_CC_CHAIN = f"""WITH RECURSIVE {_SHINGLES_SQL.strip()},
{_MINHASH_SQL},
{_BANDS_SQL},
{_CAPPED_BANDS_SQL},
{_PAIRS_SQL},
{_COMPONENTS_SQL.strip()}"""

ORACLE = {
    "dedup_exact": """
SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS text_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
""",
    "dedup_exact_survivors": """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         min(doc_id) OVER (
           PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         ) AS keeper
  FROM documents
) WHERE doc_id = keeper
""",
    "ngram_jaccard_pairs": f"""
WITH {_SHINGLES_SQL.strip()},
counts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN counts ca ON ca.doc_id = i.doc_a
JOIN counts cb ON cb.doc_id = i.doc_b
WHERE i.n_inter * 1.0 / (ca.n_sh + cb.n_sh - i.n_inter) >= {JACCARD_THRESHOLD}
""",
    "minhash_signatures": f"""
WITH {_SHINGLES_SQL.strip()},
{_MINHASH_SQL}
SELECT doc_id, h0, h1, h2, h3 FROM minhash
""",
    "minhash_lsh_pairs": f"""
WITH {_SHINGLES_SQL.strip()},
{_MINHASH_SQL},
{_BANDS_SQL},
{_CAPPED_BANDS_SQL},
{_PAIRS_SQL},
{_JACCARD_TAIL.strip()}
""",
    "lsh_eval_precision_recall": f"""
WITH {_SHINGLES_SQL.strip()},
{_MINHASH_SQL},
{_BANDS_SQL},
{_CAPPED_BANDS_SQL},
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM capped_bands l JOIN capped_bands r
    ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
),
counts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.doc_a
  JOIN counts cb ON cb.doc_id = i.doc_b
  WHERE i.n_inter * 1.0 / (ca.n_sh + cb.n_sh - i.n_inter) >= {JACCARD_THRESHOLD}
),
hits AS (
  SELECT t.doc_a FROM truth t
  JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
)
SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
       CAST((SELECT count(*) FROM hits) AS DOUBLE)
         / (SELECT count(*) FROM truth) AS lsh_recall,
       CAST((SELECT count(*) FROM hits) AS DOUBLE)
         / (SELECT count(*) FROM cand) AS candidate_precision
""",
    "minhash_dup_components": f"""
{_CC_CHAIN}
SELECT doc_id, component FROM comps
""",
    "minhash_dup_groups": f"""
{_CC_CHAIN}
SELECT component AS canonical_doc_id, count(*) AS n_docs
FROM comps GROUP BY component
""",
    "minhash_dedup_survivors": f"""
{_CC_CHAIN}
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comps WHERE doc_id != component)
""",
}


# SimHash oracle: the 16-bit shingle hash is the first 4 hex chars of
# md5(shingle); bit b lives in hex digit 3 - b//4 at position b%4, and a
# digit's value is its index in '0123456789abcdef' — pure string ops, so
# the whole signature is engine-neutral SQL (no conv() needed).
def _hexbit_sql(b: int) -> str:
    digit = f"substring(md5(sh), {4 - b // 4}, 1)"
    return f"(((strpos('0123456789abcdef', {digit}) - 1) >> {b % 4}) & 1)"


_SIMHASH_SQL = (
    "sims AS (\n  SELECT doc_id, count(*) AS n,\n    "
    + ",\n    ".join(f"sum({_hexbit_sql(b)}) AS b{b}" for b in range(16))
    + "\n  FROM shingles GROUP BY doc_id\n),\n"
    "sigs AS (\n  SELECT doc_id, "
    + " + ".join(
        f"(CASE WHEN b{b} * 2 > n THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    + " AS simhash\n  FROM sims\n)"
)

ORACLE["simhash_signatures"] = f"""
WITH {_SHINGLES_SQL.strip()},
{_SIMHASH_SQL}
SELECT doc_id, CAST(simhash AS BIGINT) AS simhash FROM sigs
"""

ORACLE["simhash_dup_groups"] = f"""
WITH {_SHINGLES_SQL.strip()},
{_SIMHASH_SQL}
SELECT CAST(simhash AS BIGINT) AS simhash, count(*) AS n_docs,
       min(doc_id) AS canonical_doc_id
FROM sigs GROUP BY simhash HAVING count(*) > 1
"""

ORACLE["near_dup_source_matrix"] = f"""
SELECT da.source AS source_a, db.source AS source_b, count(*) AS n_pairs
FROM ({ORACLE["minhash_lsh_pairs"]}) p
JOIN documents da ON p.doc_a = da.doc_id
JOIN documents db ON p.doc_b = db.doc_id
GROUP BY da.source, db.source
"""

ORACLE["incremental_minhash_new_docs"] = f"""
WITH {_SHINGLES_SQL.strip()},
{_MINHASH_SQL},
{_BANDS_SQL},
{_CAPPED_BANDS_SQL},
icands AS (
  SELECT DISTINCT b.doc_id AS new_id, c.doc_id AS old_id
  FROM capped_bands b JOIN capped_bands c
    ON b.band = c.band AND b.sig = c.sig
  WHERE b.doc_id % {INCR_MOD} = {INCR_REM}
    AND c.doc_id % {INCR_MOD} <> {INCR_REM}
),
icounts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
iinter AS (
  SELECT p.new_id, p.old_id, count(*) AS n_inter
  FROM icands p
  JOIN shingles a ON a.doc_id = p.new_id
  JOIN shingles b ON b.doc_id = p.old_id AND b.sh = a.sh
  GROUP BY p.new_id, p.old_id
)
SELECT i.new_id AS doc_id, i.old_id AS dup_of_doc_id,
       CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
FROM iinter i
JOIN icounts ca ON ca.doc_id = i.new_id
JOIN icounts cb ON cb.doc_id = i.old_id
WHERE i.n_inter * 1.0 / (ca.n_sh + cb.n_sh - i.n_inter)
      >= {JACCARD_THRESHOLD}
"""

# Stored-index twin: identical verification, but the hot-bucket set is
# defined by CORPUS occupancy only (the index is built before the batch
# exists), and candidates come from batch bands ⋈ corpus bands.
ORACLE["incremental_minhash_indexed"] = f"""
WITH {_SHINGLES_SQL.strip()},
{_MINHASH_SQL},
{_BANDS_SQL},
corpus_bands AS (
  SELECT doc_id, band, sig FROM bands
  WHERE doc_id % {INCR_MOD} <> {INCR_REM}
),
hot AS (
  SELECT band, sig FROM corpus_bands
  GROUP BY band, sig HAVING count(*) > {LSH_BUCKET_CAP}
),
batch_capped AS (
  SELECT b.doc_id, b.band, b.sig
  FROM (SELECT doc_id, band, sig FROM bands
        WHERE doc_id % {INCR_MOD} = {INCR_REM}) b
  ANTI JOIN hot h ON b.band = h.band AND b.sig = h.sig
),
icands AS (
  SELECT DISTINCT b.doc_id AS new_id, c.doc_id AS old_id
  FROM batch_capped b JOIN corpus_bands c
    ON b.band = c.band AND b.sig = c.sig
),
icounts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
iinter AS (
  SELECT p.new_id, p.old_id, count(*) AS n_inter
  FROM icands p
  JOIN shingles a ON a.doc_id = p.new_id
  JOIN shingles b ON b.doc_id = p.old_id AND b.sh = a.sh
  GROUP BY p.new_id, p.old_id
)
SELECT i.new_id AS doc_id, i.old_id AS dup_of_doc_id,
       CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
FROM iinter i
JOIN icounts ca ON ca.doc_id = i.new_id
JOIN icounts cb ON cb.doc_id = i.old_id
WHERE i.n_inter * 1.0 / (ca.n_sh + cb.n_sh - i.n_inter)
      >= {JACCARD_THRESHOLD}
"""

ORACLE["incremental_dedup_new_docs"] = f"""
WITH hashed AS (
  SELECT doc_id, lang, source,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS text_hash
  FROM documents
), corpus AS (
  SELECT DISTINCT text_hash FROM hashed WHERE doc_id % {INCR_MOD} <> {INCR_REM}
)
SELECT b.doc_id, b.lang, b.source,
       (c.text_hash IS NOT NULL) AS is_duplicate
FROM hashed b LEFT JOIN corpus c USING (text_hash)
WHERE b.doc_id % {INCR_MOD} = {INCR_REM}
"""

# same values as the rebuild-per-call form: the index IS the corpus'
# distinct hash set, with no cap asymmetry in the exact path
ORACLE["incremental_dedup_indexed"] = ORACLE["incremental_dedup_new_docs"]

ORACLE["duplicate_spans"] = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS l,
         len(string_split(text, ' ')) AS n
  FROM documents
), grams AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         array_to_string(l[i:i + {SPAN_L} - 1], ' ') AS gram
  FROM base, unnest(generate_series(1, n - {SPAN_L} + 1)) AS t(i)
  WHERE n >= {SPAN_L}
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
), hits AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM grams JOIN dup USING (gram)
)
SELECT doc_id, min(pos) AS span_start,
       max(pos) + {SPAN_L} - 1 AS span_end,
       count(*) AS n_dup_grams
FROM hits GROUP BY doc_id, grp
"""

ORACLE["substring_dedup_rewrite"] = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS l,
         len(string_split(text, ' ')) AS n
  FROM documents
), grams AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         array_to_string(l[i:i + {SPAN_L} - 1], ' ') AS gram
  FROM base, unnest(generate_series(1, n - {SPAN_L} + 1)) AS t(i)
  WHERE n >= {SPAN_L}
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
), hits AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM grams JOIN dup USING (gram)
), spans AS (
  SELECT doc_id, min(pos) AS span_start,
         max(pos) + {SPAN_L} - 1 AS span_end
  FROM hits GROUP BY doc_id, grp
), content AS (
  SELECT s.doc_id, s.span_start, s.span_end,
         array_to_string(b.l[s.span_start:s.span_end], ' ') AS span_text
  FROM spans s JOIN base b USING (doc_id)
), cuts AS (
  SELECT doc_id, span_start, span_end FROM (
    SELECT doc_id, span_start, span_end,
           row_number() OVER (PARTITION BY span_text
                              ORDER BY doc_id, span_start) AS rn
    FROM content) WHERE rn > 1
), covered AS (
  SELECT doc_id, list(DISTINCT p) AS covered FROM (
    SELECT doc_id, unnest(generate_series(span_start, span_end)) AS p
    FROM cuts) GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n AS INTEGER) AS n_words,
       CAST(b.n - len(kept) AS INTEGER) AS n_removed,
       coalesce(array_to_string(kept, ' '), '') AS deduped_text
FROM (
  SELECT b.doc_id, b.n,
         list_filter(b.l, (w, i) ->
           c.covered IS NULL OR NOT list_contains(c.covered, i)) AS kept
  FROM base b LEFT JOIN covered c USING (doc_id)
) b
"""


# --- line-level (CCNet-style) cross-document dedup ---------------------------
LINE_LEN = 8  # tokens per synthesized line (documents carry no newlines)


def line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document LINE-level dedup accounting — the CCNet/RefinedWeb
    paragraph-hash pass (Wenzek et al. 2019 dedup by paragraph hash;
    Penedo et al. 2023 line dedup), the granularity between exact-doc
    dedup (dedup_exact) and substring dedup (duplicate_spans): a line is
    dropped when the SAME line already occurred anywhere in the corpus,
    keeping the globally-first occurrence (min (doc_id, line_idx)).

    The corpus has no newlines, so lines are synthesized as fixed
    LINE_LEN-token windows (the context_chunks idiom); per doc the output
    is pure-BIGINT accounting: total lines, lines whose content occurs
    >1× corpus-wide, lines removed (non-first occurrences), and tokens
    retained after the cut.

    Scale shape: lines explode map-side in the scan stage (≈ n_tokens/
    LINE_LEN rows, each reduced to a 32-char md5 — the raw line text
    never shuffles); ONE hash exchange on the line hash computes both the
    corpus occurrence count and the first-occurrence rank in a single
    partitioning (two window phases, one exchange); one groupBy(doc_id)
    folds the per-doc counters. No sort of the corpus, no driver state —
    at 100 TB this is the standard two-shuffle dedup-accounting plan, and
    the same ranked-lines intermediate is the rewrite input if the caller
    wants the retained text (substring_dedup_rewrite's act-step shape).
    [extension]"""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split("text", " ").alias("ws"))
    n_lines = F.expr(f"(size(ws) + {LINE_LEN - 1}) div {LINE_LEN}")
    line_toks = F.slice("ws", F.col("li") * LINE_LEN + 1, LINE_LEN)
    lines = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_lines - 1)).alias("li"),
        "ws",
    ).select(
        "doc_id",
        "li",
        F.md5(F.array_join(line_toks, " ")).alias("h"),
        F.size(line_toks).cast("long").alias("ntok"),
    )
    part = Window.partitionBy("h")
    ranked = lines.select(
        "doc_id",
        "ntok",
        F.count("*").over(part).alias("cnt"),
        F.row_number().over(part.orderBy("doc_id", "li")).alias("rn"),
    )
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum((F.col("cnt") > 1).cast("long")).alias("n_dup_lines"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_removed"),
        F.sum(
            F.when(F.col("rn") == 1, F.col("ntok")).otherwise(F.lit(0))
        ).alias("n_tokens_kept"),
    )


QUERIES["line_dedup_stats"] = line_dedup_stats

ORACLE["line_dedup_stats"] = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), lines AS (
  SELECT doc_id, i AS li,
         md5(array_to_string(
           list_slice(ws, {LINE_LEN} * i + 1, {LINE_LEN} * i + {LINE_LEN}),
           ' ')) AS h,
         CAST(len(list_slice(ws, {LINE_LEN} * i + 1,
                             {LINE_LEN} * i + {LINE_LEN})) AS BIGINT) AS ntok
  FROM (SELECT doc_id, ws,
               unnest(range((len(ws) + {LINE_LEN - 1}) // {LINE_LEN})) AS i
        FROM base)
), ranked AS (
  SELECT doc_id, ntok,
         count(*) OVER (PARTITION BY h) AS cnt,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, li) AS rn
  FROM lines
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_lines,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN rn = 1 THEN ntok ELSE 0 END) AS BIGINT)
         AS n_tokens_kept
FROM ranked GROUP BY doc_id
"""


def softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (the downweight-don't-drop recipe, cf. SoftDeDup
    /
    "perplexed by perplexity" lines of work): instead of evicting
    near-duplicates, every document gets a sampling weight
    round_half_up(10⁶ / cluster_size) so a k-way duplicate cluster
    contributes ~one document's worth of expected training mass while
    preserving every variant's text. Docs outside any near-dup component
    keep weight 10⁶. Output: (doc_id, cluster_size, weight_micro) —
    pure BIGINTs.

    Scale shape: cluster sizes are one aggregate over the component
    relation, joined back to the doc ids UNHINTED — near-dup members are
    commonly 20-50 % of real crawls (the r8/r9-verdict point), so a
    forced broadcast of the membership would be an OOM ceiling; AQE
    broadcasts from runtime stats only when the membership really is
    small. The corpus text never shuffles (the join carries doc_id
    alone) — the same anti-join stance as minhash_dedup_survivors, with
    the eviction replaced by arithmetic. [extension]"""
    comp = minhash_dup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cl"))
    member = comp.join(sizes, "component").select(
        "doc_id", F.col("cl").alias("cluster_size")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(member, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_size", F.lit(1)).cast("long").alias(
            "cluster_size"
        ),
        F.expr(
            "(2 * 1000000 + coalesce(cluster_size, 1))"
            " DIV (2 * coalesce(cluster_size, 1))"
        ).alias("weight_micro"),
    )


QUERIES["softdedup_weights"] = softdedup_weights

ORACLE["softdedup_weights"] = f"""{_CC_CHAIN},
sdsz AS (SELECT component, count(*) AS cl FROM comps GROUP BY component),
sdmem AS (
  SELECT c.doc_id, s.cl FROM comps c JOIN sdsz s USING (component)
)
SELECT d.doc_id,
       CAST(coalesce(m.cl, 1) AS BIGINT) AS cluster_size,
       (2 * 1000000 + coalesce(m.cl, 1)) // (2 * coalesce(m.cl, 1))
         AS weight_micro
FROM documents d LEFT JOIN sdmem m USING (doc_id)
"""


# --- LSH band-load / skew audit ----------------------------------------------
def minhash_band_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band LSH bucket-load audit: for each of the 4 bands, how many
    occupied buckets there are, the largest bucket, and the candidate-pair
    mass Σ s·(s−1)/2 the band contributes to the self-join. This is the
    dial a corpus owner reads BEFORE running the candidate join at scale:
    a hot bucket (a boilerplate-heavy signature shared by 10⁶ docs) makes
    the bucket self-join quadratic in that bucket, and this report finds
    it with one aggregate — the same pre-flight skew check
    skewed_key_histogram does for equi-joins, specialized to the banded
    signature table. Output is 4 rows of pure BIGINTs.

    Scale shape: one pass over the signature matrix (the explode puts all
    bands in the scan stage), ONE hash exchange on (band, sig), then a
    4-row rollup — strictly cheaper than the candidate join it audits.
    [extension]"""
    mh = _minhash_df(spark, sf_dir)
    bands = mh.select("doc_id", F.explode(_band_structs()).alias("bs")).select(
        F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    bucket = bands.groupBy("band", "sig").agg(F.count("*").alias("s"))
    return bucket.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.sum("s").alias("n_docs"),
        F.max("s").alias("max_bucket"),
        F.sum(F.expr("(s * (s - 1)) DIV 2")).alias("candidate_pairs"),
    )


QUERIES["minhash_band_skew_report"] = minhash_band_skew_report


def lsh_capped_buckets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability twin of the hot-bucket CAP (LSH_BUCKET_CAP): per band,
    how many (band, sig) buckets exceed the cap, how many docs sit in them,
    and the candidate-pair mass Σ s·(s−1)/2 the cap REMOVES from the
    self-join. minhash_band_skew_report shows the raw load; this report
    shows what the enforcement did — the number an operator alerts on
    (a sudden jump = a new boilerplate source flooding one signature, the
    content that should be routed to boilerplate_strip / line dedup rather
    than pairwise verification). All-zero on healthy corpora (testdata's
    largest bucket is 4); the synthetic mega-bucket test pins the nonzero
    behavior. Output: 4 rows of pure BIGINTs.

    Scale shape: same single (band, sig) exchange as the skew report —
    strictly cheaper than the join it guards. [extension]"""
    mh = _minhash_df(spark, sf_dir)
    bands = mh.select("doc_id", F.explode(_band_structs()).alias("bs")).select(
        F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    bucket = bands.groupBy("band", "sig").agg(F.count("*").alias("s"))
    hot = F.col("s") > LSH_BUCKET_CAP
    return bucket.groupBy("band").agg(
        F.sum(hot.cast("long")).alias("n_capped_buckets"),
        F.sum(F.when(hot, F.col("s")).otherwise(F.lit(0))).alias(
            "n_docs_capped"
        ),
        F.sum(
            F.when(hot, F.expr("(s * (s - 1)) DIV 2")).otherwise(F.lit(0))
        ).alias("pairs_removed"),
    )


QUERIES["lsh_capped_buckets_report"] = lsh_capped_buckets_report


def source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE-level content overlap: for every source pair, the Jaccard of
    their distinct 3-gram shingle SETS — the corpus-curation dial that says
    which sources mirror each other's CONTENT even when no individual doc
    pair crosses the near-dup threshold (a feed syndicated with edits, a
    scraped mirror with different pagination). Complements
    near_dup_source_matrix, which counts verified doc PAIRS: that report
    finds mirrored documents, this one finds mirrored corpora. Jaccard is
    emitted as round-half-up integer micros (the novelty_micro idiom) —
    pure BIGINTs, engine-exact.

    Scale shape: (shingle, source) distinct is one hash exchange off the
    shingle relation; the self-join fans out ≤ |sources| per shingle
    (bounded, NOT corpus-quadratic — at 100 TB sources number in the
    thousands while shingles number in the trillions, so cost stays ∝
    postings); totals are a |sources|-row aggregate broadcast back onto
    ≤ |sources|² result rows. [extension]"""
    # distinct=False: the (shingle, source) distinct below absorbs duplicate
    # per-doc shingles, so the per-doc set shuffle would be a wasted exchange
    # of the shingle multiset (same argument as _minhash_df, r10)
    sh = _shingles_df(spark, sf_dir, distinct=False)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ss = sh.join(docs, "doc_id").select("shingle", "source").distinct()
    counts = ss.groupBy("source").agg(F.count("*").alias("n_sh"))
    a = ss.select("shingle", F.col("source").alias("source_a"))
    b = ss.select("shingle", F.col("source").alias("source_b"))
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    ca = counts.select(
        F.col("source").alias("source_a"), F.col("n_sh").alias("na")
    )
    cb = counts.select(
        F.col("source").alias("source_b"), F.col("n_sh").alias("nb")
    )
    union_sz = F.col("na") + F.col("nb") - F.col("n_shared")
    return (
        shared.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "na",
            "nb",
            F.expr(
                "(2 * 1000000 * n_shared + (na + nb - n_shared))"
                " DIV (2 * (na + nb - n_shared))"
            ).alias("jaccard_micro"),
        )
    )


QUERIES["source_shingle_overlap"] = source_shingle_overlap

ORACLE["minhash_band_skew_report"] = f"""
WITH {_SHINGLES_SQL.strip()},
{_MINHASH_SQL},
{_BANDS_SQL},
bsz AS (SELECT band, sig, count(*) AS s FROM bands GROUP BY band, sig)
SELECT band,
       count(*) AS n_buckets,
       CAST(sum(s) AS BIGINT) AS n_docs,
       CAST(max(s) AS BIGINT) AS max_bucket,
       CAST(sum((s * (s - 1)) // 2) AS BIGINT) AS candidate_pairs
FROM bsz GROUP BY band
"""

ORACLE["source_shingle_overlap"] = f"""
WITH {_SHINGLES_SQL.strip()},
ss AS (
  SELECT DISTINCT s.sh, d.source
  FROM shingles s JOIN documents d USING (doc_id)
),
scounts AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY source),
sshared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, s.n_shared,
       ca.n_sh AS na, cb.n_sh AS nb,
       (2 * 1000000 * s.n_shared + (ca.n_sh + cb.n_sh - s.n_shared))
         // (2 * (ca.n_sh + cb.n_sh - s.n_shared)) AS jaccard_micro
FROM sshared s
JOIN scounts ca ON ca.source = s.source_a
JOIN scounts cb ON cb.source = s.source_b
"""

ORACLE["lsh_capped_buckets_report"] = f"""
WITH {_SHINGLES_SQL.strip()},
{_MINHASH_SQL},
{_BANDS_SQL},
bsz AS (SELECT band, sig, count(*) AS s FROM bands GROUP BY band, sig)
SELECT band,
       CAST(sum(CASE WHEN s > {LSH_BUCKET_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_capped_buckets,
       CAST(sum(CASE WHEN s > {LSH_BUCKET_CAP} THEN s ELSE 0 END) AS BIGINT)
         AS n_docs_capped,
       CAST(sum(CASE WHEN s > {LSH_BUCKET_CAP}
                     THEN (s * (s - 1)) // 2 ELSE 0 END) AS BIGINT)
         AS pairs_removed
FROM bsz GROUP BY band
"""


# --- dup-cluster size distribution -------------------------------------------
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the resolved near-dup components — the
    power-law health check every dedup run reports (a corpus dominated by
    a few giant clusters points at boilerplate/templating, not genuine
    duplication; cf. the cluster-size plots in the C4/RefinedWeb dedup
    writeups). Output: (cluster_size, n_clusters), pure BIGINTs.

    Scale shape: two K-row aggregates past the component resolution
    (∝ near-dup docs, tiny next to the corpus); nothing new shuffles.
    [extension]"""
    groups = minhash_dup_groups(spark, sf_dir)
    return groups.groupBy(F.col("n_docs").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters")
    )


QUERIES["dup_cluster_size_histogram"] = dup_cluster_size_histogram

ORACLE["dup_cluster_size_histogram"] = f"""{_CC_CHAIN},
gsz AS (SELECT component, count(*) AS n_docs FROM comps GROUP BY component)
SELECT n_docs AS cluster_size, count(*) AS n_clusters
FROM gsz GROUP BY n_docs
"""


# --- SimHash separability eval ----------------------------------------------
def simhash_distance_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-distance profile of TRUE near-dup pairs under the 16-bit
    SimHash: for every exact-Jaccard ≥ τ pair (the same ground truth
    lsh_eval_precision_recall scores the banded-LSH path against), the
    Hamming distance between the two docs' signatures, histogrammed.
    This is how a corpus owner picks the SimHash radius r before trusting
    bit-flip candidate generation at scale: the histogram mass at
    distance ≤ r IS the recall that radius would achieve. Output:
    (hamming, n_pairs), pure BIGINTs, ≤ 17 rows.

    Scale shape: signatures are one aggregate over the shingle relation
    (already linear); the truth relation here is the documented O(n²)
    exactness baseline (ngram_jaccard_pairs) — at production scale you
    feed verified LSH pairs instead, same join shape: two equi-joins of a
    pair list onto a 1-row-per-doc signature table, then a ≤17-row
    rollup. [extension]"""
    truth = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sig = simhash_signatures(spark, sf_dir)
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    return (
        truth.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(F.bit_count(F.expr("sig_a ^ sig_b")).cast("long").alias("hamming"))
        .groupBy("hamming")
        .agg(F.count("*").alias("n_pairs"))
    )


QUERIES["simhash_distance_eval"] = simhash_distance_eval

ORACLE["simhash_distance_eval"] = f"""
WITH {_SHINGLES_SQL.strip()},
{_SIMHASH_SQL},
counts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.doc_a
  JOIN counts cb ON cb.doc_id = i.doc_b
  WHERE i.n_inter * 1.0 / (ca.n_sh + cb.n_sh - i.n_inter) >= {JACCARD_THRESHOLD}
)
SELECT CAST(bit_count(xor(CAST(sa.simhash AS BIGINT),
                          CAST(sb.simhash AS BIGINT))) AS BIGINT) AS hamming,
       count(*) AS n_pairs
FROM truth t
JOIN sigs sa ON sa.doc_id = t.doc_a
JOIN sigs sb ON sb.doc_id = t.doc_b
GROUP BY 1
"""


# --- crawl-order novelty -----------------------------------------------------
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document NOVELTY in crawl order: the fraction of a doc's
    distinct 3-gram shingles whose corpus-wide FIRST occurrence (min
    doc_id — ids stand in for crawl order) is this document. New content
    scores ~10⁶ micro-units; a re-crawl of already-seen material scores
    ~0 — the marginal-contribution dial dataset curators read when
    deciding whether another dump of a source still adds tokens worth
    training on (complement of the dedup family: duplicate share tells
    you what to CUT, novelty tells you what a source still ADDS).
    Output: (doc_id, n_shingles, n_first_seen, novelty_micro) — pure
    BIGINTs, round-half-up micro quantization.

    Scale shape: the same single shingle-hash exchange as line/substring
    dedup — one min-aggregate per shingle joined back on the same key
    (ReuseExchange), one per-doc rollup; text never shuffles.
    [extension]"""
    sh = _shingles_df(spark, sf_dir)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per = sh.join(first, "shingle").groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
            "n_first_seen"
        ),
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_first_seen",
        F.expr(
            "(2 * 1000000 * n_first_seen + n_shingles)"
            " DIV (2 * n_shingles)"
        ).alias("novelty_micro"),
    )


QUERIES["ngram_novelty_score"] = ngram_novelty_score

ORACLE["ngram_novelty_score"] = f"""
WITH {_SHINGLES_SQL.strip()},
nfirst AS (SELECT sh, min(doc_id) AS first_doc FROM shingles GROUP BY sh),
nper AS (
  SELECT s.doc_id, count(*) AS n_shingles,
         CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_first_seen
  FROM shingles s JOIN nfirst f USING (sh)
  GROUP BY s.doc_id
)
SELECT doc_id, n_shingles, n_first_seen,
       (2 * 1000000 * n_first_seen + n_shingles) // (2 * n_shingles)
         AS novelty_micro
FROM nper
"""


# --- containment verification (subset-duplication) ---------------------------
def minhash_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified by Broder CONTAINMENT instead of Jaccard:
    c(A,B) = |A∩B| / |A| over 3-gram shingle sets, reported in BOTH
    directions for every candidate. Jaccard misses subset duplication — a
    short doc quoted whole inside a long one scores near-zero Jaccard but
    containment ~1 — and real curation pipelines check both (Broder's
    original resemblance/containment pair); the consumer cuts at its own τ
    per direction. The containments are single integer÷integer binary64
    divisions, deterministic across engines. Output: (doc_a, doc_b,
    n_inter, na, nb, containment_a, containment_b).

    Scale shape: reuses the staged candidate-overlap sufficient statistics
    (one computation serves the Jaccard and containment verifiers); nothing
    beyond the already-linear LSH path runs. [extension]"""
    overlap = _candidate_overlap(spark, sf_dir)
    return (
        overlap.select(
            "doc_a",
            "doc_b",
            "n_inter",
            "na",
            "nb",
            (F.col("n_inter") / F.col("na")).alias("containment_a"),
            (F.col("n_inter") / F.col("nb")).alias("containment_b"),
        )
    )


QUERIES["minhash_containment_pairs"] = minhash_containment_pairs

ORACLE["minhash_containment_pairs"] = f"""
WITH {_SHINGLES_SQL.strip()},
{_MINHASH_SQL},
{_BANDS_SQL},
{_CAPPED_BANDS_SQL},
{_PAIRS_SQL},
ccounts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
cinter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
  FROM pairs p
  JOIN shingles a ON a.doc_id = p.doc_a
  JOIN shingles b ON b.doc_id = p.doc_b AND b.sh = a.sh
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       ca.n_sh AS na, cb.n_sh AS nb,
       CAST(i.n_inter AS DOUBLE) / ca.n_sh AS containment_a,
       CAST(i.n_inter AS DOUBLE) / cb.n_sh AS containment_b
FROM cinter i
JOIN ccounts ca ON ca.doc_id = i.doc_a
JOIN ccounts cb ON cb.doc_id = i.doc_b
"""


# --- edit-distance verification ----------------------------------------------
ED_RATIO_DEN = 40  # keep pairs with edit_distance ≤ max_len / 40 (≤ 2.5%)


def edit_distance_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified by CHARACTER edit distance: Levenshtein over
    the raw texts, kept when ed ≤ max(len_a, len_b) / 40 — the
    near-identical tier (sub-2.5% character churn: OCR noise, template
    fill-ins), tuned so the cut discriminates within the planted near-dups
    in testdata. Shingle Jaccard is
    blind to within-word edits (OCR noise, diacritic stripping, tokenizer
    drift) that leave few 3-grams intact; the edit-ratio check is the
    standard second opinion (cf. the fuzzy-dedup stage of web-corpus
    pipelines). Levenshtein is O(len²) per pair, which is exactly why it
    runs on the LSH-pruned candidate set and never all-pairs. The keep
    predicate is integer arithmetic (ed·ED_RATIO_DEN ≤ max_len, i.e.
    ed·40 ≤ max_len); outputs are pure
    BIGINTs plus one integer÷integer binary64 division. Output: (doc_a,
    doc_b, edit_distance, max_len, ed_ratio).

    Scale shape: the candidate relation (tiny next to the corpus) joins the
    doc dimension twice by key — the pair side broadcasts, the corpus text
    stays map-side (near_dup_source_matrix's stance); the quadratic-cost
    primitive is confined to |candidates| rows. [extension]"""
    candidates = _lsh_candidates(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    ed = F.levenshtein("text_a", "text_b")
    ml = F.greatest(F.length("text_a"), F.length("text_b"))
    return (
        candidates.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            ed.cast("long").alias("edit_distance"),
            ml.cast("long").alias("max_len"),
        )
        .filter(F.col("edit_distance") * ED_RATIO_DEN <= F.col("max_len"))
        .withColumn(
            "ed_ratio", F.col("edit_distance") / F.col("max_len")
        )
    )


QUERIES["edit_distance_verified_pairs"] = edit_distance_verified_pairs

ORACLE["edit_distance_verified_pairs"] = f"""
WITH {_SHINGLES_SQL.strip()},
{_MINHASH_SQL},
{_BANDS_SQL},
{_CAPPED_BANDS_SQL},
{_PAIRS_SQL},
ed AS (
  SELECT p.doc_a, p.doc_b,
         CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
         CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
           AS max_len
  FROM pairs p
  JOIN documents da ON da.doc_id = p.doc_a
  JOIN documents db ON db.doc_id = p.doc_b
)
SELECT doc_a, doc_b, edit_distance, max_len,
       CAST(edit_distance AS DOUBLE) / max_len AS ed_ratio
FROM ed
WHERE edit_distance * {ED_RATIO_DEN} <= max_len
"""
