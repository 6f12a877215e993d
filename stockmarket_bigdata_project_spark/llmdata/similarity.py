"""Similarity search over embedding columns (north-star extension).

Baseline: brute-force cosine top-k — CORRECT by construction, quadratic;
this is what verifies the approximate paths. Scale path: IVF-style coarse
quantization — assign every vector to its nearest centroid bucket (one pass),
probe only the query's nearest `nprobe` buckets (candidate set ∝ n/k·nprobe).
At 100 TB the bucket assignment is a broadcast-join + argmin (linear, no
shuffle of the big side beyond the final bucket grouping).

Exactness (playbook rule 2, hardened r3): every vector is quantized to
integer micros (`round(x·10^6)`) BEFORE any arithmetic. Dot products and
norms over 64 micro components are integers ≤ ~2·10^13 — far below 2^53 —
so the double fold is EXACT in any accumulation order (cluster, DuckDB,
anything); sqrt is IEEE-correctly-rounded in every engine; and the closing
division is one shared binary64 op. Raw cosines are therefore bit-identical
across engines with NO rounding anywhere — the previous round-9/round-6
absorption existed only because the float fold and DuckDB's
list_cosine_similarity (a different accumulation) disagreed in low bits,
which is exactly the environment-sensitive class that cost r2 a gate row.

All in built-in higher-order functions — no Python UDF in the hot path.
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from .dedup import INCR_MOD, INCR_REM

N_QUERIES = 10  # vec_id < 10 serve as the query set
TOP_K = 5
# IVF cost model: per-query probe cost ∝ nprobe · (n / k); assignment cost
# ∝ n · k. The FAISS rule of thumb is k ≈ 4·sqrt(n) (balances the two at
# ~n^1.5 total, recall tuned via nprobe/k). k = 8 is sized for the 500–2000
# vector testdata; re-derive for your corpus. SemDeDup's k is separately
# n-proportional (see SEMDEDUP_VECS_PER_CLUSTER) because its within-cluster
# cost is quadratic in cluster size, not linear.
N_CENTROIDS = 8
NPROBE = 4  # recall/cost dial: fraction of the space scanned = nprobe / k


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, mvec): components as exact integer micros (doubles
    holding integer values — both engines round the same binary64 product
    to the same integer, scale-0 rounding has no decimal-shift step)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000000, 0)
        ).alias("mvec"),
    )


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def _cosine(a, b) -> F.Column:
    """Bit-exact across engines when a and b hold integer micros (exact
    integer dot/norms → IEEE sqrt → one division)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id < N_QUERIES).
    Ranking key = (cos DESC, candidate id ASC): the cosine is bit-exact
    (integer-micros basis), so the ordering needs no rounding absorption;
    id breaks true ties deterministically."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("mvec").alias("qvec")
    )
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("mvec").alias("cvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            _cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", F.col("cos").alias("cosine"), "rank")
    )


RANGE_TAU = 0.2  # cosine floor for the range query


def embedding_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine RANGE query (the radius twin of top-k): every corpus vector
    with cosine ≥ RANGE_TAU against each query vector — what a retrieval
    layer runs when the contract is 'all sufficiently-similar items', not
    'the best k'. Same broadcast-query linear scan as knn_bruteforce; the
    threshold compare is bit-exact (integer-micros cosine), so the result
    SET is engine-identical, no rank cutoff ambiguity."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("mvec").alias("qvec")
    )
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("mvec").alias("cvec"))
    cos = _cosine(F.col("qvec"), F.col("cvec"))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= RANGE_TAU)
    )


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: centroids = first N_CENTROIDS vectors (deterministic
    stand-in for k-means — the bucketing mechanics, not the training, are the
    operator). Each vector → nearest centroid; each query probes its NPROBE
    nearest buckets. Approximate w.r.t. true kNN (recall pinned against
    knn_bruteforce in tests) but fully deterministic — fixed centroids,
    bit-exact cosines + id tie-breaks — so it is value-level oracle-checked."""
    e = _emb(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("mvec").alias("cvec")
    )
    # assign: argmax over centroids of cosine (broadcast, linear)
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("centroid_id")
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "mvec",
            "centroid_id",
            _cosine(F.col("mvec"), F.col("cvec")).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "mvec", F.col("centroid_id").alias("bucket"))
    )
    # queries probe their NPROBE nearest centroid buckets
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("centroid_id")
    )
    probes = (
        assigned.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("mvec").alias("qvec"))
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qvec",
            "centroid_id",
            _cosine(F.col("qvec"), F.col("cvec")).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= NPROBE)
        .select("query_id", "qvec", F.col("centroid_id").alias("bucket"))
    )
    # candidates = vectors in probed buckets only
    cands = probes.join(assigned, "bucket").filter(
        F.col("query_id") != F.col("vec_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        cands.select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _cosine(F.col("qvec"), F.col("mvec")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", F.col("cos").alias("cosine"), "rank")
    )


def retrieval_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the IVF ANN path against the exact scan — the
    evaluation every similarity stack runs before trusting its index: per
    query, |exact top-K ∩ IVF top-K| and the recall in integer micro
    units (round-half-up — no double anywhere, playbook rule 11).

    Both sides are the engine's own deterministic rankings, so the number
    is value-level oracle-checkable, not a property-test bound (the ≥0.8
    floor lives in test_properties; THIS query reports the exact figure a
    dashboard would track). Cost: bounded by the two kNN plans over the
    N_QUERIES query set — evaluation never scans more than retrieval did."""
    exact = knn_bruteforce(spark, sf_dir).select("query_id", "cand_id")
    approx = knn_ivf(spark, sf_dir).select("query_id", "cand_id")
    hits = (
        exact.join(approx, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    base = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        )
        .withColumn(
            "recall_micro",
            F.expr("(2 * n_hit * 1000000 + n_exact) DIV (2 * n_exact)"),
        )
    )


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — CORRECTNESS BASELINE ONLY.

    This is a deliberately uncapped all-pairs theta join (O(n²) by
    construction, like knn_bruteforce and ngram_jaccard_pairs): it exists
    to define the exact result set that the scale path —
    embedding_lsh_near_dup (banded hyperplane LSH, shuffle-linear) — is
    recall-scored against in tests/test_properties.py. Do NOT run it on a
    production corpus; run embedding_lsh_near_dup. Threshold tuned to
    testdata's max inter-vector cosine ~0.51 so the query has signal."""
    # norms fold ONCE per input row, not once per pair (the semdedup
    # precedent, r14): the theta join then pays a single HOF dot per pair
    # instead of three folds. dot/(na·nb) is the same binary64 algebra as
    # _cosine — bit-identical results.
    e = _emb(spark, sf_dir).withColumn("nrm", _norm(F.col("mvec")))
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("mvec").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("mvec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.40)
    )


SEMDEDUP_TAU = 0.40  # within-cluster cosine above this = semantic duplicate
# k ∝ n: one centroid per this many vectors keeps expected cluster size —
# and the within-cluster pairwise cost — constant as the corpus grows;
# floored at N_CENTROIDS it reproduces the historical k = 8 at every gate
# SF (500/500/2000 vectors), so proven results are bit-unchanged.
SEMDEDUP_VECS_PER_CLUSTER = 250


def semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    the embedding space and removing, within each cluster, every vector
    that has a higher-cosine-than-τ neighbor with a smaller id (the
    keep-one-representative rule; SemDeDup likewise prunes within clusters
    only and does no cross-cluster closure). The k-means step is the same
    deterministic fixed-centroid stand-in as knn_ivf — the operator under
    test is the cluster-bounded pairwise prune, not centroid training.

    Scale shape: assignment is a broadcast-centroid argmax (linear over
    the corpus); the pairwise step is bucket-local — O(Σ cᵢ²) for cluster
    sizes cᵢ, exactly the cost SemDeDup budgets by choosing k ∝ n so
    clusters stay bounded. k here IS proportional: k = max(N_CENTROIDS,
    n_vecs // SEMDEDUP_VECS_PER_CLUSTER), which reproduces the historical
    k = 8 bit-exactly at every gate SF (500/500/2000 vectors) and keeps
    expected cluster size — hence per-cluster pair cost — constant as the
    corpus grows. The round-7 scale study measured the fixed-k form at
    slope ~1.3 (superlinear) on 4× volume; this rule drops it to ~0.87
    (PERFORMANCE.md "Measured scaling exponents"). The count rides in as
    a 1-row broadcast, not a driver collect. The remaining super-constant
    term is the flat n·k broadcast assignment — map-side multiply-adds,
    no shuffle — which a 100 TB deployment replaces with hierarchical /
    ANN centroid assignment: that path EXISTS as semdedup_survivors_ann
    (two-level coarse→fine, ~2n·√k), and this flat form is the exactness
    reference its agreement floor is pinned against.
    Exactness: integer-micros cosines + id tie-breaks, so kept/removed is
    bit-deterministic and value-level oracle-checked."""
    e = _emb(spark, sf_dir)
    k_df = e.agg(
        F.expr(
            f"greatest(CAST({N_CENTROIDS} AS BIGINT),"
            f" count(*) DIV {SEMDEDUP_VECS_PER_CLUSTER})"
        ).alias("k")
    )
    cent = (
        e.crossJoin(F.broadcast(k_df))
        .filter(F.col("vec_id") < F.col("k"))
        .select(F.col("vec_id").alias("centroid_id"), F.col("mvec").alias("cvec"))
    )
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("centroid_id")
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "mvec",
            "centroid_id",
            _cosine(F.col("mvec"), F.col("cvec")).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "mvec", F.col("centroid_id").alias("bucket"))
    )
    # norms fold ONCE per (bucket, vector) input row, not once per pair:
    # the pairwise filter then pays a single HOF dot per pair instead of
    # three folds. cos = dot / (norm_a · norm_b) is the same binary64
    # algebra as _cosine, so results stay bit-exact vs the oracle.
    with_norm = assigned.withColumn("nrm", _norm(F.col("mvec")))
    a = with_norm.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_a"),
        F.col("mvec").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = with_norm.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_b"),
        F.col("mvec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    removed = (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= SEMDEDUP_TAU
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        assigned.join(removed, "vec_id", "left")
        .select(
            "vec_id",
            "bucket",
            (F.coalesce("is_dup", F.lit(0)) == 0).cast("int").alias("kept"),
        )
    )


N_PLANES = 32  # 8 bands × 4 bits
LSH_BANDS = 8
BITS_PER_BAND = 4
EMB_DIMS = 64


def _plane_sign(p: int, d: int) -> int:
    """±1 hyperplane component from md5(p:d) hex parity — a deterministic
    pseudo-random constant matrix reproducible in any engine/language
    (unlike Spark's Murmur3 F.hash), so the LSH is oracle-checkable."""
    import hashlib

    return 1 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


PLANES = [[_plane_sign(p, d) for d in range(EMB_DIMS)] for p in range(N_PLANES)]


def embedding_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH near-dup (the scale path for
    embedding_near_dup_pairs, which is O(n²)): sign-of-dot-product bits
    against N_PLANES deterministic ±1 hyperplanes (md5-derived constants,
    PLANES), banded 8×4; candidate pairs collide in ≥1 band, then exact
    cosine verifies. Linear shuffle (bucket join); recall vs the
    brute-force baseline pinned in tests/test_properties.py.

    Sizing note for scale: BITS_PER_BAND=4 gives only 16 buckets per band
    — right for the 500–2000-vector testdata (expected bucket ~n/16), but
    bucket population grows ∝ n at fixed bits, so a production corpus must
    grow bits-per-band ≈ log2(n) (and band count with target recall) to
    keep expected bucket size — and the within-bucket pair mass — bounded;
    the dedup-side LSH_BUCKET_CAP precedent applies here identically if
    the sig distribution is skewed.

    Exactness: integer-micros components, so every partial sum is an
    integer < 2^53 — double arithmetic on them is exact and associative,
    and the sign bit cannot flip with accumulation order (on a cluster or
    in DuckDB). The verification cosine shares the same basis, so it is
    emitted raw (bit-identical), unrounded."""
    e = _emb(spark, sf_dir)
    # bit p = dot(mvec, h_p) >= 0 — exact integer-valued double arithmetic
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    "mvec",
                    F.array(*[F.lit(float(s)) for s in PLANES[p]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0
        ).cast("int").alias(f"b{p}")
        for p in range(N_PLANES)
    ]
    sigs = e.select("vec_id", *bits)
    # All bands in ONE pass via an exploded (band, sig) struct array —
    # the dedup-side _build_lsh_candidates shape (r14; the prior 8-way
    # unionByName recomputed the 32 interpreted plane dots once per band
    # per self-join side, 16 evaluations of the signature projection;
    # measured 7.5 s → ~1 s steady). The lazy localCheckpoint materializes
    # the band table once for both join sides (eager=False keeps plan
    # construction job-free, the pinned repo contract). Same rows: union
    # of 8 per-band selects ≡ explode of the 8 structs.
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    "",
                    *[
                        f"b{band * BITS_PER_BAND + j}"
                        for j in range(BITS_PER_BAND)
                    ],
                ).alias("sig"),
            )
            for band in range(LSH_BANDS)
        ]
    )
    all_bands = (
        sigs.select("vec_id", F.explode(band_structs).alias("bs"))
        .select(
            "vec_id",
            F.col("bs.band").alias("band"),
            F.col("bs.sig").alias("sig"),
        )
        .localCheckpoint(eager=False)
    )
    l, r = all_bands.alias("l"), all_bands.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b"))
        .distinct()
    )
    # verification: norms fold once per vector row (semdedup precedent,
    # r14) — one HOF dot per candidate pair instead of three folds;
    # dot/(na·nb) is _cosine's algebra bit-for-bit.
    with_nrm = e.withColumn("nrm", _norm(F.col("mvec")))
    va = with_nrm.select(
        F.col("vec_id").alias("vec_a"),
        F.col("mvec").alias("va"),
        F.col("nrm").alias("na"),
    )
    vb = with_nrm.select(
        F.col("vec_id").alias("vec_b"),
        F.col("mvec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (
                _dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.40)
    )


def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-vector (centroid) per label + each vector's cosine to its own
    label centroid — the 'cluster cohesion' diagnostic of an embedding table.

    The centroid is computed in exact integers end-to-end: per-dim BIGINT
    sums of the micro components (associative — bit-identical on any
    cluster layout and in DuckDB), then quantized back to integer micros
    with the rational round-half-away idiom (cosine is scale-invariant, so
    dividing by n only to re-quantize loses nothing). The per-row cosine to
    that integer centroid is then bit-exact raw — no decimal casts of
    genuine reals, no output rounding (both were the r2-class
    environment-sensitive ops). Still one hash aggregate + broadcast join."""
    e = _emb(spark, sf_dir)
    sums = e.groupBy("label").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.element_at("mvec", d + 1).cast("long")).alias(f"s{d}")
            for d in range(EMB_DIMS)
        ],
    )

    def _cm(d: int) -> F.Column:
        s, n = F.col(f"s{d}"), F.col("n")
        num = F.abs(s) * 2 + n
        den = 2 * n
        sign = F.when(s < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
        return (sign * ((num - F.pmod(num, den)) / den).cast("long")).cast(
            "double"
        )

    centroid = sums.select(
        "label", F.array(*[_cm(d) for d in range(EMB_DIMS)]).alias("cmvec")
    )
    joined = e.join(F.broadcast(centroid), "label")
    return joined.select(
        "label",
        "vec_id",
        _cosine(F.col("mvec"), F.col("cmvec")).alias("cos_to_centroid"),
    )


def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of each embedding (per-vector absmax
    scale) — the storage/serving compression every 100 TB vector corpus
    applies before ANN. Entirely map-side higher-order functions, zero
    shuffle, and exactly value-checkable: components are integer micros,
    the code is sign·round_half_up(|m|·127/scale) computed by pure integer
    arithmetic (|m|·127·2 < 2^53), and the reconstruction L1 error is
    emitted in exact integer units of micro/127 (|127·m − code·scale| —
    no division ever happens, so there is nothing to round)."""
    e = load_table(spark, sf_dir, "embeddings")
    mvec = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000000, 0)
    )
    m = e.select("vec_id", mvec.alias("mvec"))
    scale = F.array_max(F.transform("mvec", F.abs))

    def _code(x):
        s = F.col("scale")
        q = (
            2 * F.abs(x) * 127 + s - F.pmod(2 * F.abs(x) * 127 + s, 2 * s)
        ) / (2 * s)
        return (F.signum(x) * q).cast("long")

    with_scale = m.withColumn("scale", scale).filter(F.col("scale") > 0)
    coded = with_scale.withColumn(
        "codes", F.transform("mvec", _code)
    )
    resid = F.aggregate(
        F.zip_with(
            "mvec",
            "codes",
            lambda mv, c: F.abs(127 * mv - c.cast("double") * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # codes serialized as fixed-width hex (2 chars per dim, biased by +127
    # into [0, 254]) — the driver's canonicalizer cannot sort/hash list
    # columns (r3 harness error), and the minhash h0..h3 string pattern is
    # the proven-green shape for array-valued results
    codes_hex = F.array_join(
        F.transform(
            "codes", lambda c: F.lpad(F.lower(F.hex(c + 127)), 2, "0")
        ),
        "",
    )
    return coded.select(
        "vec_id",
        F.col("scale").cast("long").alias("scale_micros"),
        codes_hex.alias("codes_hex"),
        resid.cast("long").alias("l1_err_127ths"),
    )


QUERIES = {
    "knn_bruteforce": knn_bruteforce,
    "embedding_range_query": embedding_range_query,
    "knn_ivf": knn_ivf,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "embedding_lsh_near_dup": embedding_lsh_near_dup,
    "label_centroid_similarity": label_centroid_similarity,
    "embedding_int8_quantization": embedding_int8_quantization,
    "semdedup_survivors": semdedup_survivors,
    "retrieval_eval_recall": retrieval_eval_recall,
}

_MVEC_SQL = "list_transform(embedding, x -> round(x::DOUBLE * 1000000))"


def _cos_sql(a: str, b: str) -> str:
    """Mirror of _cosine over integer-micros lists: exact dot/norms, IEEE
    sqrt, one division — bit-identical to the Spark fold."""
    return (
        f"list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})))"
    )


ORACLE = {
    "knn_bruteforce": f"""
WITH e AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
), scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         {_cos_sql("a.mvec", "b.mvec")} AS cos
  FROM e a JOIN e b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERIES}
), ranked AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos AS cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
""",
    "embedding_near_dup_pairs": f"""
WITH e AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_cos_sql("a.mvec", "b.mvec")} AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_cos_sql("a.mvec", "b.mvec")} >= 0.40
""",
    # IVF mirrors the Spark pipeline stage-for-stage: argmax assignment,
    # nprobe probe, bucket-join, rank — same bit-exact cos + id tie-breaks
    "knn_ivf": f"""
WITH e AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, mvec AS cvec FROM e WHERE vec_id < {N_CENTROIDS}
), assigned AS (
  SELECT vec_id, mvec, centroid_id AS bucket FROM (
    SELECT e.vec_id, e.mvec, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_cos_sql("e.mvec", "c.cvec")} DESC,
                      c.centroid_id ASC) AS rn
    FROM e CROSS JOIN cent c) WHERE rn = 1
), probes AS (
  SELECT query_id, qvec, bucket FROM (
    SELECT a.vec_id AS query_id, a.mvec AS qvec, c.centroid_id AS bucket,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_cos_sql("a.mvec", "c.cvec")} DESC,
                      c.centroid_id ASC) AS rn
    FROM assigned a CROSS JOIN cent c WHERE a.vec_id < {N_QUERIES}
  ) WHERE rn <= {NPROBE}
), cands AS (
  SELECT p.query_id, a.vec_id AS cand_id,
         {_cos_sql("p.qvec", "a.mvec")} AS cos
  FROM probes p JOIN assigned a
    ON a.bucket = p.bucket AND a.vec_id <> p.query_id
), ranked AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, cand_id ASC) AS rank
  FROM cands
)
SELECT query_id, cand_id, cos AS cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
""",
    # LSH oracle: same md5-derived PLANES constants inlined as list
    # literals; micro-quantized dot → exact sign bits (see docstring)
    "embedding_lsh_near_dup": f"""
WITH e AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
), sigs AS (
  SELECT vec_id, mvec, concat({", ".join(
      "CASE WHEN list_dot_product(mvec, ["
      + ", ".join(f"{float(s)}" for s in PLANES[p])
      + "]) >= 0 THEN '1' ELSE '0' END"
      for p in range(N_PLANES)
  )}) AS bits
  FROM e
), bands AS (
  SELECT vec_id, t.band,
         substring(bits, t.band * {BITS_PER_BAND} + 1, {BITS_PER_BAND}) AS sig
  FROM sigs, generate_series(0, {LSH_BANDS - 1}) AS t(band)
), cand AS (
  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.sig = r.sig AND l.vec_id < r.vec_id
)
SELECT c.vec_a, c.vec_b, {_cos_sql("a.mvec", "b.mvec")} AS cosine
FROM cand c
JOIN e a ON a.vec_id = c.vec_a
JOIN e b ON b.vec_id = c.vec_b
WHERE {_cos_sql("a.mvec", "b.mvec")} >= 0.40
""",
    # centroid via exact per-dim BIGINT sums re-quantized to integer micros
    # (rational round-half-away) — bit-identical to the Spark aggregate
    # regardless of accumulation order (see docstring above)
    "label_centroid_similarity": f"""
WITH e AS (
  SELECT vec_id, label, {_MVEC_SQL} AS mvec FROM embeddings
), comp AS (
  SELECT label, d, sum(CAST(mvec[d] AS BIGINT)) AS s, count(*) AS n
  FROM e, generate_series(1, {EMB_DIMS}) AS t(d)
  GROUP BY label, d
), cm AS (
  SELECT label, d,
         (CASE WHEN s < 0 THEN -1 ELSE 1 END)
           * CAST((num - (num % den)) / den AS BIGINT) AS c
  FROM (SELECT *, abs(s) * 2 + n AS num, 2 * n AS den FROM comp)
), cent AS (
  SELECT label, list(CAST(c AS DOUBLE) ORDER BY d) AS cmvec
  FROM cm GROUP BY label
)
SELECT e.label, e.vec_id,
       {_cos_sql("e.mvec", "c.cmvec")} AS cos_to_centroid
FROM e JOIN cent c ON e.label = c.label
""",
    # codes via pure integer floor/round arithmetic (// floors; operands
    # positive) — byte-for-byte the Spark lambda; l1 error never divides
    "embedding_int8_quantization": f"""
WITH m AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
), s AS (
  SELECT vec_id, mvec,
         list_max(list_transform(mvec, x -> abs(x))) AS scale
  FROM m WHERE list_max(list_transform(mvec, x -> abs(x))) > 0
), q AS (
  SELECT vec_id, mvec, scale,
         list_transform(mvec, x ->
           (CASE WHEN x < 0 THEN CAST(-1 AS BIGINT)
                 WHEN x > 0 THEN CAST(1 AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END)
           * (CAST(2 * abs(x) * 127 + scale AS BIGINT)
              // CAST(2 * scale AS BIGINT))) AS codes
  FROM s
)
SELECT vec_id, CAST(scale AS BIGINT) AS scale_micros,
       array_to_string(list_transform(codes,
         c -> lpad(lower(hex(c + 127)), 2, '0')), '') AS codes_hex,
       CAST(list_aggregate(list_transform(mvec,
              (x, i) -> abs(127 * x - codes[i] * scale)), 'sum') AS BIGINT)
         AS l1_err_127ths
FROM q
""",
}

ORACLE["retrieval_eval_recall"] = f"""
WITH exact AS (
  SELECT query_id, cand_id FROM ({ORACLE["knn_bruteforce"]})
), approx AS (
  SELECT query_id, cand_id FROM ({ORACLE["knn_ivf"]})
), base AS (
  SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id
), hits AS (
  SELECT e.query_id, count(*) AS n_hit
  FROM exact e JOIN approx a USING (query_id, cand_id)
  GROUP BY e.query_id
)
SELECT b.query_id, b.n_exact,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       (2 * CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000 + b.n_exact)
         // (2 * b.n_exact) AS recall_micro
FROM base b LEFT JOIN hits h USING (query_id)
"""

ORACLE["embedding_range_query"] = f"""
WITH e AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
)
SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       {_cos_sql("a.mvec", "b.mvec")} AS cosine
FROM e a JOIN e b ON b.vec_id <> a.vec_id
WHERE a.vec_id < {N_QUERIES}
  AND {_cos_sql("a.mvec", "b.mvec")} >= {RANGE_TAU}
"""

ORACLE["semdedup_survivors"] = f"""
WITH e AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, mvec AS cvec FROM e
  WHERE vec_id < (SELECT greatest(CAST({N_CENTROIDS} AS BIGINT),
                                  count(*) // {SEMDEDUP_VECS_PER_CLUSTER})
                  FROM e)
), assigned AS (
  SELECT vec_id, mvec, centroid_id AS bucket FROM (
    SELECT e.vec_id, e.mvec, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_cos_sql("e.mvec", "c.cvec")} DESC,
                      c.centroid_id ASC) AS rn
    FROM e CROSS JOIN cent c) WHERE rn = 1
), removed AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {_cos_sql("a.mvec", "b.mvec")} >= {SEMDEDUP_TAU}
)
SELECT a.vec_id, a.bucket,
       CAST(r.vec_id IS NULL AS INTEGER) AS kept
FROM assigned a LEFT JOIN removed r ON r.vec_id = a.vec_id
"""


def semdedup_survivors_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with ANN (two-level / coarse-quantized) centroid assignment
    — the 100 TB form of semdedup_survivors, whose one remaining
    super-linear term was the FLAT n·k broadcast-centroid argmax (k ∝ n ⇒
    n²/250 multiply-adds; measured slope contribution in PERFORMANCE.md).
    Here assignment goes through the standard hierarchical route every
    large-scale IVF deployment uses (the seam knn_ivf and the r7 verdict
    both name):

      1. g = max(2, ⌊√k⌋) COARSE centroids (the first g fine centroids);
      2. each fine centroid → its nearest coarse cell (k·g work, tiny);
      3. each vector → nearest coarse cell (n·g);
      4. each vector → nearest FINE centroid WITHIN that cell only
         (n · k/g expected).

    Assignment drops from n·k to n·(g + k/g) ≈ 2n√k — with k ∝ n that is
    O(n^1.5) versus the flat form's O(n²), and the within-cluster prune
    (identical keep-smallest-id rule, same SEMDEDUP_TAU) stays the
    dominant, linear-by-construction term. Broadcast budget (r9): only
    the g ≈ √k coarse centroids are hint-broadcast (sub-linear in n);
    the k-row fine map — linear in n — joins on coarse_id unhinted, and
    both argmax stages are partial max(struct) aggregates so the probe
    fan-outs collapse map-side instead of crossing an exchange. Every coarse cell is non-empty
    (a coarse centroid's own fine row maps to itself at cosine 1), so
    assignment is total.

    Approximation is confined to assignment: a vector near a cell
    boundary may land on a different (near-equal-cosine) fine bucket
    than the flat argmax — the same recall trade knn_ivf makes; the
    agreement floor vs the flat twin is pinned in test_properties.
    Determinism is NOT traded: fixed centroids, bit-exact integer-micros
    cosines, id tie-breaks — the whole pipeline is value-level
    oracle-checked, stage-for-stage, like every other ANN query here.
    [extension]"""
    e = _emb(spark, sf_dir)
    kg = e.agg(
        F.expr(
            f"greatest(CAST({N_CENTROIDS} AS BIGINT),"
            f" count(*) DIV {SEMDEDUP_VECS_PER_CLUSTER})"
        ).alias("k")
    ).select(
        "k",
        F.expr(
            "greatest(CAST(2 AS BIGINT),"
            " CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT))"
        ).alias("g"),
    )
    cent = (
        e.crossJoin(F.broadcast(kg))
        .filter(F.col("vec_id") < F.col("k"))
        .select(F.col("vec_id").alias("centroid_id"), F.col("mvec").alias("cvec"))
    )
    coarse = (
        e.crossJoin(F.broadcast(kg))
        .filter(F.col("vec_id") < F.col("g"))
        .select(F.col("vec_id").alias("coarse_id"), F.col("mvec").alias("gvec"))
    )
    # fine centroid -> coarse cell (k·g rows, broadcast-sized)
    fmap_w = Window.partitionBy("centroid_id").orderBy(
        F.desc("gcos"), F.asc("coarse_id")
    )
    fmap = (
        cent.crossJoin(F.broadcast(coarse))
        .select(
            "centroid_id",
            "cvec",
            "coarse_id",
            _cosine(F.col("cvec"), F.col("gvec")).alias("gcos"),
        )
        .withColumn("rn", F.row_number().over(fmap_w))
        .filter(F.col("rn") == 1)
        .select("centroid_id", "cvec", "coarse_id")
    )
    # vector -> coarse cell (n·g probe work). Argmax as a partial-merge
    # max(struct) aggregate, NOT a window: the n·g candidate fan-out
    # collapses to one row per vector MAP-SIDE (each vector's g candidates
    # are co-partitioned with it after the broadcast cross join), so the
    # exchange carries n rows — a window would shuffle all n·g. Struct
    # ordering (gcos DESC via max, then -coarse_id for the ASC id
    # tie-break) matches the flat twin's row_number ordering exactly.
    vcoarse = (
        e.crossJoin(F.broadcast(coarse))
        .select(
            "vec_id",
            "mvec",
            "coarse_id",
            _cosine(F.col("mvec"), F.col("gvec")).alias("gcos"),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("gcos"),
                    (-F.col("coarse_id")).alias("neg_id"),
                    F.col("coarse_id"),
                    F.col("mvec"),
                )
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.mvec").alias("mvec"),
            F.col("best.coarse_id").alias("coarse_id"),
        )
    )
    # vector -> fine bucket WITHIN its coarse cell (n·k/g expected work).
    # The fine map is k rows with k ∝ n — a hint-forced broadcast here
    # grows linearly with the corpus (the r8-verdict scale bug), so the
    # join is UNHINTED on coarse_id: at scale it is a shuffle join whose
    # build side holds only the ~k/g ≈ √k fine centroids of one coarse
    # cell per partition; at toy SF AQE may still broadcast it from
    # runtime stats, which is a size-based decision, not a forced plan.
    # The argmax is again a partial max(struct): every candidate row for a
    # vector carries the vector's single coarse_id, so candidates are
    # co-partitioned after the join and collapse map-side before the
    # exchange on vec_id.
    assigned = (
        vcoarse.join(fmap, "coarse_id")
        .select(
            "vec_id",
            "mvec",
            "centroid_id",
            _cosine(F.col("mvec"), F.col("cvec")).alias("ccos"),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("ccos"),
                    (-F.col("centroid_id")).alias("neg_id"),
                    F.col("centroid_id"),
                    F.col("mvec"),
                )
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.mvec").alias("mvec"),
            F.col("best.centroid_id").alias("bucket"),
        )
    )
    # within-bucket prune: duplicated verbatim from semdedup_survivors
    # (hash-proven) rather than refactoring a proven query
    with_norm = assigned.withColumn("nrm", _norm(F.col("mvec")))
    a = with_norm.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_a"),
        F.col("mvec").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = with_norm.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_b"),
        F.col("mvec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    removed = (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= SEMDEDUP_TAU
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        assigned.join(removed, "vec_id", "left")
        .select(
            "vec_id",
            "bucket",
            (F.coalesce("is_dup", F.lit(0)) == 0).cast("int").alias("kept"),
        )
    )


QUERIES["semdedup_survivors_ann"] = semdedup_survivors_ann

ORACLE["semdedup_survivors_ann"] = f"""
WITH e AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
), kg AS (
  SELECT k, greatest(CAST(2 AS BIGINT),
                     CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT)) AS g
  FROM (SELECT greatest(CAST({N_CENTROIDS} AS BIGINT),
                        count(*) // {SEMDEDUP_VECS_PER_CLUSTER}) AS k
        FROM e)
), cent AS (
  SELECT vec_id AS centroid_id, mvec AS cvec FROM e
  WHERE vec_id < (SELECT k FROM kg)
), coarse AS (
  SELECT vec_id AS coarse_id, mvec AS gvec FROM e
  WHERE vec_id < (SELECT g FROM kg)
), fmap AS (
  SELECT centroid_id, cvec, coarse_id FROM (
    SELECT c.centroid_id, c.cvec, o.coarse_id,
           row_number() OVER (
             PARTITION BY c.centroid_id
             ORDER BY {_cos_sql("c.cvec", "o.gvec")} DESC,
                      o.coarse_id ASC) AS rn
    FROM cent c CROSS JOIN coarse o) WHERE rn = 1
), vcoarse AS (
  SELECT vec_id, mvec, coarse_id FROM (
    SELECT e.vec_id, e.mvec, o.coarse_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_cos_sql("e.mvec", "o.gvec")} DESC,
                      o.coarse_id ASC) AS rn
    FROM e CROSS JOIN coarse o) WHERE rn = 1
), assigned AS (
  SELECT vec_id, mvec, centroid_id AS bucket FROM (
    SELECT v.vec_id, v.mvec, f.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_cos_sql("v.mvec", "f.cvec")} DESC,
                      f.centroid_id ASC) AS rn
    FROM vcoarse v JOIN fmap f USING (coarse_id)) WHERE rn = 1
), removed AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {_cos_sql("a.mvec", "b.mvec")} >= {SEMDEDUP_TAU}
)
SELECT a.vec_id, a.bucket,
       CAST(r.vec_id IS NULL AS INTEGER) AS kept
FROM assigned a LEFT JOIN removed r ON r.vec_id = a.vec_id
"""


# --- incremental SemDeDup (r9): ingestion-time semantic dedup -----------------
# Completes the per-batch dedup family: incremental_dedup_new_docs (exact
# hash), incremental_minhash_new_docs / _indexed (lexical near-dup), and now
# the semantic layer — an incoming embedding batch checked against the
# EXISTING corpus's SemDeDup structure. As with the LSH pair, the structure
# is CORPUS-ONLY (k from the corpus count, centroids drawn from corpus
# vectors): an index built last night cannot know today's batch.


def _sem_incr_sides(spark: SparkSession, sf_dir: str):
    """(corpus, batch) embedding sides under the family's shared slice
    contract (vec_id % INCR_MOD == INCR_REM → the incoming batch)."""
    e = _emb(spark, sf_dir).select("vec_id", "mvec")
    is_new = F.col("vec_id") % INCR_MOD == INCR_REM
    return e.filter(~is_new), e.filter(is_new)


def _argmax_assign(side: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, mvec, bucket): nearest-centroid assignment as a partial
    max(struct) aggregate (candidates collapse map-side; ordering gcos
    DESC then centroid_id ASC via the negated-id component — the proven
    semdedup_survivors_ann idiom)."""
    return (
        side.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "mvec",
            "centroid_id",
            _cosine(F.col("mvec"), F.col("cvec")).alias("ccos"),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("ccos"),
                    (-F.col("centroid_id")).alias("neg_id"),
                    F.col("centroid_id"),
                    F.col("mvec"),
                )
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.mvec").alias("mvec"),
            F.col("best.centroid_id").alias("bucket"),
        )
    )


def incremental_semdedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time SEMANTIC dedup: each batch vector paired with every
    same-cluster CORPUS vector at cosine ≥ SEMDEDUP_TAU — the SemDeDup
    analogue of incremental_minhash_new_docs (paraphrases and re-encodes
    that share no shingles but embed together). Output:
    (vec_id, dup_of_vec_id, cosine), batch × corpus only — batch-internal
    duplicates are the NEXT nightly rebuild's job, exactly as in the LSH
    incremental form.

    Scale shape: per-batch work is |batch|·k flat assignment plus a
    bucket equi-join against the corpus assignment (expected cluster
    size is constant by the k ∝ n rule, so the join is ∝ |batch|). This
    form recomputes the corpus assignment per call — the shape proof;
    the stored-index production twin is incremental_semdedup_indexed,
    whose per-batch plan never runs the corpus pipeline. The flat
    broadcast-centroid argmax here is the documented exactness baseline
    (semdedup_survivors precedent); at 100 TB the assignment seam is the
    two-level ANN route, which the indexed twin uses. [extension]"""
    corpus, batch = _sem_incr_sides(spark, sf_dir)
    k_df = corpus.agg(
        F.expr(
            f"greatest(CAST({N_CENTROIDS} AS BIGINT),"
            f" count(*) DIV {SEMDEDUP_VECS_PER_CLUSTER})"
        ).alias("k")
    )
    cent = (
        corpus.crossJoin(F.broadcast(k_df))
        .filter(F.col("vec_id") < F.col("k"))
        .select(F.col("vec_id").alias("centroid_id"), F.col("mvec").alias("cvec"))
    )
    ca = _argmax_assign(corpus, cent).withColumn("nrm", _norm(F.col("mvec")))
    ba = _argmax_assign(batch, cent).withColumn("nrm", _norm(F.col("mvec")))
    cos = _dot(F.col("bm"), F.col("cm")) / (F.col("bn") * F.col("cn"))
    return (
        ba.select(
            "bucket",
            F.col("vec_id"),
            F.col("mvec").alias("bm"),
            F.col("nrm").alias("bn"),
        )
        .join(
            ca.select(
                "bucket",
                F.col("vec_id").alias("dup_of_vec_id"),
                F.col("mvec").alias("cm"),
                F.col("nrm").alias("cn"),
            ),
            "bucket",
        )
        .filter(cos >= SEMDEDUP_TAU)
        .select("vec_id", "dup_of_vec_id", cos.alias("cosine"))
    )


_SEM_BUCKETS = 8


def _ensure_semdedup_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Write the corpus-side SemDeDup structure once per (session, corpus)
    (the nightly index build): the √k-row coarse-centroid table, the k-row
    fine-centroid→coarse-cell map, and the corpus assignment — every
    corpus vector with its fine bucket, micros vector, and norm —
    BUCKETED on the bucket key, so the per-batch join below needs no
    exchange on the corpus side. Corpus assignment itself uses the
    two-level ANN route (the semdedup_survivors_ann path), which is what
    a 100 TB deployment stores. Cache keying / table-tag hygiene:
    indexcache (r9-ADVICE fix)."""
    from .indexcache import drop_table, get_or_build, table_tag

    tag = table_tag(sf_dir)
    gt, ft, at = (
        f"sem_coarse_{tag}",
        f"sem_fmap_{tag}",
        f"sem_corpus_{tag}",
    )

    def build() -> tuple[str, str, str]:
        for t in (gt, ft, at):
            drop_table(spark, t)
        corpus, _ = _sem_incr_sides(spark, sf_dir)
        kg = corpus.agg(
            F.expr(
                f"greatest(CAST({N_CENTROIDS} AS BIGINT),"
                f" count(*) DIV {SEMDEDUP_VECS_PER_CLUSTER})"
            ).alias("k")
        ).select(
            "k",
            F.expr(
                "greatest(CAST(2 AS BIGINT),"
                " CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT))"
            ).alias("g"),
        )
        cent = (
            corpus.crossJoin(F.broadcast(kg))
            .filter(F.col("vec_id") < F.col("k"))
            .select(
                F.col("vec_id").alias("centroid_id"),
                F.col("mvec").alias("cvec"),
            )
        )
        coarse = (
            corpus.crossJoin(F.broadcast(kg))
            .filter(F.col("vec_id") < F.col("g"))
            .select(
                F.col("vec_id").alias("coarse_id"),
                F.col("mvec").alias("gvec"),
            )
        )
        coarse.write.mode("overwrite").saveAsTable(gt)
        fmap = (
            cent.crossJoin(F.broadcast(spark.table(gt)))
            .select(
                "centroid_id",
                "cvec",
                "coarse_id",
                _cosine(F.col("cvec"), F.col("gvec")).alias("gcos"),
            )
            .groupBy("centroid_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("gcos"),
                        (-F.col("coarse_id")).alias("neg_id"),
                        F.col("coarse_id"),
                        F.col("cvec"),
                    )
                ).alias("best")
            )
            .select(
                "centroid_id",
                F.col("best.cvec").alias("cvec"),
                F.col("best.coarse_id").alias("coarse_id"),
            )
        )
        fmap.write.mode("overwrite").saveAsTable(ft)
        vcoarse = _two_level_assign(corpus, spark.table(gt), spark.table(ft))
        vcoarse.withColumn("nrm", _norm(F.col("mvec"))).write.mode(
            "overwrite"
        ).bucketBy(_SEM_BUCKETS, "bucket").sortBy("bucket").saveAsTable(at)
        return gt, ft, at

    return get_or_build(spark, "sem_index", sf_dir, build)


def _two_level_assign(
    side: DataFrame, coarse: DataFrame, fmap: DataFrame
) -> DataFrame:
    """(vec_id, mvec, bucket) via the coarse→fine ANN route: broadcast
    argmax over the √k coarse rows (sub-linear payload — the broadcast
    budget semdedup_survivors_ann documents), then an UNHINTED coarse_id
    join against the k-row fine map with a map-side max(struct) argmax."""
    vcoarse = (
        side.crossJoin(F.broadcast(coarse))
        .select(
            "vec_id",
            "mvec",
            "coarse_id",
            _cosine(F.col("mvec"), F.col("gvec")).alias("gcos"),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("gcos"),
                    (-F.col("coarse_id")).alias("neg_id"),
                    F.col("coarse_id"),
                    F.col("mvec"),
                )
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.mvec").alias("mvec"),
            F.col("best.coarse_id").alias("coarse_id"),
        )
    )
    return (
        vcoarse.join(fmap, "coarse_id")
        .select(
            "vec_id",
            "mvec",
            "centroid_id",
            _cosine(F.col("mvec"), F.col("cvec")).alias("ccos"),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("ccos"),
                    (-F.col("centroid_id")).alias("neg_id"),
                    F.col("centroid_id"),
                    F.col("mvec"),
                )
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.mvec").alias("mvec"),
            F.col("best.centroid_id").alias("bucket"),
        )
    )


def incremental_semdedup_indexed(
    spark: SparkSession, sf_dir: str, batch_cap: int | None = None
) -> DataFrame:
    """Stored-index incremental SemDeDup: the per-batch production form.
    The corpus structure (coarse centroids, fine map, bucketed corpus
    assignment with norms) is PRE-MATERIALIZED by _ensure_semdedup_index;
    the per-batch plan assigns BATCH vectors via the two-level ANN route
    (broadcast payload = the √k coarse table only; the k-row fine map
    joins unhinted on coarse_id), then bucket-joins the bucketed corpus
    table — no exchange on the corpus side — and filters exact
    integer-micros cosine ≥ SEMDEDUP_TAU. Per-batch cost: |batch|·√k
    map-side multiply-adds + a join ∝ |batch|·E[cluster size] (constant
    by the k ∝ n rule); the corpus embedding pipeline never runs
    (plan-pinned). Assignment is ANN-approximate exactly as in
    semdedup_survivors_ann — boundary vectors may land in a neighboring
    near-equal-cosine cell — and the oracle mirrors the two-level route
    stage-for-stage, so the query stays value-level checked.

    ``batch_cap`` (tooling only, not registered): additionally bounds the
    batch to vec_id < batch_cap so tools_scale_study can grow the corpus
    x1→x8 at FIXED batch size — the flat-runtime proof behind the
    per-batch cost claim (same hook as incremental_minhash_indexed).
    [extension]"""
    gt, ft, at = _ensure_semdedup_index(spark, sf_dir)
    _, batch = _sem_incr_sides(spark, sf_dir)
    if batch_cap is not None:
        batch = batch.filter(F.col("vec_id") < batch_cap)
    ba = _two_level_assign(
        batch, spark.table(gt), spark.table(ft)
    ).withColumn("nrm", _norm(F.col("mvec")))
    corpus_idx = spark.table(at)
    cos = _dot(F.col("bm"), F.col("cm")) / (F.col("bn") * F.col("cn"))
    return (
        ba.select(
            "bucket",
            "vec_id",
            F.col("mvec").alias("bm"),
            F.col("nrm").alias("bn"),
        )
        .join(
            corpus_idx.select(
                "bucket",
                F.col("vec_id").alias("dup_of_vec_id"),
                F.col("mvec").alias("cm"),
                F.col("nrm").alias("cn"),
            ),
            "bucket",
        )
        .filter(cos >= SEMDEDUP_TAU)
        .select("vec_id", "dup_of_vec_id", cos.alias("cosine"))
    )


QUERIES["incremental_semdedup_new_docs"] = incremental_semdedup_new_docs
QUERIES["incremental_semdedup_indexed"] = incremental_semdedup_indexed

_SEM_SIDES_SQL = f"""e AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
), corpus AS (
  SELECT * FROM e WHERE vec_id % {INCR_MOD} <> {INCR_REM}
), batch AS (
  SELECT * FROM e WHERE vec_id % {INCR_MOD} = {INCR_REM}
)"""

ORACLE["incremental_semdedup_new_docs"] = f"""
WITH {_SEM_SIDES_SQL}, cent AS (
  SELECT vec_id AS centroid_id, mvec AS cvec FROM corpus
  WHERE vec_id < (SELECT greatest(CAST({N_CENTROIDS} AS BIGINT),
                                  count(*) // {SEMDEDUP_VECS_PER_CLUSTER})
                  FROM corpus)
), ca AS (
  SELECT vec_id, mvec, centroid_id AS bucket FROM (
    SELECT s.vec_id, s.mvec, c.centroid_id,
           row_number() OVER (
             PARTITION BY s.vec_id
             ORDER BY {_cos_sql("s.mvec", "c.cvec")} DESC,
                      c.centroid_id ASC) AS rn
    FROM corpus s CROSS JOIN cent c) WHERE rn = 1
), ba AS (
  SELECT vec_id, mvec, centroid_id AS bucket FROM (
    SELECT s.vec_id, s.mvec, c.centroid_id,
           row_number() OVER (
             PARTITION BY s.vec_id
             ORDER BY {_cos_sql("s.mvec", "c.cvec")} DESC,
                      c.centroid_id ASC) AS rn
    FROM batch s CROSS JOIN cent c) WHERE rn = 1
)
SELECT b.vec_id, c.vec_id AS dup_of_vec_id,
       {_cos_sql("b.mvec", "c.mvec")} AS cosine
FROM ba b JOIN ca c USING (bucket)
WHERE {_cos_sql("b.mvec", "c.mvec")} >= {SEMDEDUP_TAU}
"""

ORACLE["incremental_semdedup_indexed"] = f"""
WITH {_SEM_SIDES_SQL}, kg AS (
  SELECT k, greatest(CAST(2 AS BIGINT),
                     CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT)) AS g
  FROM (SELECT greatest(CAST({N_CENTROIDS} AS BIGINT),
                        count(*) // {SEMDEDUP_VECS_PER_CLUSTER}) AS k
        FROM corpus)
), cent AS (
  SELECT vec_id AS centroid_id, mvec AS cvec FROM corpus
  WHERE vec_id < (SELECT k FROM kg)
), coarse AS (
  SELECT vec_id AS coarse_id, mvec AS gvec FROM corpus
  WHERE vec_id < (SELECT g FROM kg)
), fmap AS (
  SELECT centroid_id, cvec, coarse_id FROM (
    SELECT c.centroid_id, c.cvec, o.coarse_id,
           row_number() OVER (
             PARTITION BY c.centroid_id
             ORDER BY {_cos_sql("c.cvec", "o.gvec")} DESC,
                      o.coarse_id ASC) AS rn
    FROM cent c CROSS JOIN coarse o) WHERE rn = 1
), ca AS (
  SELECT vec_id, mvec, centroid_id AS bucket FROM (
    SELECT v.vec_id, v.mvec, f.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_cos_sql("v.mvec", "f.cvec")} DESC,
                      f.centroid_id ASC) AS rn
    FROM (
      SELECT vec_id, mvec, coarse_id FROM (
        SELECT s.vec_id, s.mvec, o.coarse_id,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY {_cos_sql("s.mvec", "o.gvec")} DESC,
                          o.coarse_id ASC) AS rn
        FROM corpus s CROSS JOIN coarse o) WHERE rn = 1
    ) v JOIN fmap f USING (coarse_id)) WHERE rn = 1
), ba AS (
  SELECT vec_id, mvec, centroid_id AS bucket FROM (
    SELECT v.vec_id, v.mvec, f.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_cos_sql("v.mvec", "f.cvec")} DESC,
                      f.centroid_id ASC) AS rn
    FROM (
      SELECT vec_id, mvec, coarse_id FROM (
        SELECT s.vec_id, s.mvec, o.coarse_id,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY {_cos_sql("s.mvec", "o.gvec")} DESC,
                          o.coarse_id ASC) AS rn
        FROM batch s CROSS JOIN coarse o) WHERE rn = 1
    ) v JOIN fmap f USING (coarse_id)) WHERE rn = 1
)
SELECT b.vec_id, c.vec_id AS dup_of_vec_id,
       {_cos_sql("b.mvec", "c.mvec")} AS cosine
FROM ba b JOIN ca c USING (bucket)
WHERE {_cos_sql("b.mvec", "c.mvec")} >= {SEMDEDUP_TAU}
"""


# --- sparse (lexical) retrieval: the inverted-index counterpart of ANN -------
SR_QUERY_MOD = 41  # doc_id % MOD == REM → the retrieval query set (~2.4%)
SR_QUERY_REM = 3


def _weighted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, w): the tf·idf-weighted inverted index shared by the
    sparse retrieval and hybrid-fusion queries. w = tf · idf_bits with
    idf_bits(t) = ilog2(n_docs div df(t)) — exact integers end to end, and
    terms with idf_bits = 0 (df > n_docs/2) are pruned, which is what
    bounds posting-list length at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split("text", " ").alias("ws"))
    n = F.greatest(F.size("ws") - 2, F.lit(0))
    tri = F.arrays_zip(
        F.slice("ws", 1, n), F.slice("ws", 2, n), F.slice("ws", 3, n)
    )
    occ = base.select("doc_id", F.explode(tri).alias("g")).select(
        "doc_id",
        F.concat_ws(" ", F.col("g.0"), F.col("g.1"), F.col("g.2")).alias(
            "term"
        ),
    )
    postings = occ.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_tbl = postings.groupBy("term").agg(F.count("*").alias("df"))
    n_tbl = docs.agg(F.count("*").alias("n_docs"))
    idf = (
        df_tbl.crossJoin(F.broadcast(n_tbl))
        .select(
            "term",
            (F.length(F.bin(F.expr("n_docs div df"))) - F.lit(1)).alias(
                "idf_bits"
            ),
        )
        .filter(F.col("idf_bits") >= 1)  # integer-exact stop-term pruning
    )
    return postings.join(idf, "term").select(
        "term", "doc_id", (F.col("tf") * F.col("idf_bits")).alias("w")
    )
SR_TOP_K = 3


def sparse_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical top-k retrieval over an inverted index — the sparse
    (BM25-family) counterpart of the dense paths above: score(q, d) =
    Σ over shared terms of w(q,t)·w(d,t), with integer tf·idf weights
    idf_bits(t) = ilog2(n_docs div df(t)) (Shannon code length — the same
    transcendental-free idf the LM scorers use, so the whole score is an
    exact integer).

    Terms are word 3-grams, not unigrams: the synthetic corpus has a
    ~30-word vocabulary, so every unigram is a stop word; over natural
    text the identical plan runs on word terms. Stop-term pruning falls
    out of the integer idf — df > n_docs/2 ⇒ ilog2(quotient)=0 bits ⇒ the
    term is dropped from the index, which is what bounds posting-list
    length (and therefore the index self-join) at corpus scale.

    Scale shape: postings (doc, term, tf) and df are two linear aggregates;
    the query side is a tiny deterministic id-slice of the SAME weighted
    postings relation; candidate generation is the posting-list equi-join
    on term — cost ∝ Σ_t |q_postings(t)|·|postings(t)|, bounded by the idf
    pruning, never |q|·|corpus|; top-k is a per-query window over the
    aggregated candidate scores. This is the standard distributed sparse
    retrieval plan (impact-ordered posting joins)."""
    wpost = _weighted_postings(spark, sf_dir)
    q = wpost.filter(
        F.col("doc_id") % SR_QUERY_MOD == SR_QUERY_REM
    ).select(F.col("doc_id").alias("q_id"), "term", F.col("w").alias("wq"))
    scores = (
        q.join(wpost, "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("wq") * F.col("w")).alias("score"))
    )
    win = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= SR_TOP_K)
        .select("q_id", "rank", F.col("doc_id").alias("hit_id"), "score")
    )


QUERIES["sparse_retrieval_topk"] = sparse_retrieval_topk

ORACLE["sparse_retrieval_topk"] = f"""
WITH occ AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                i -> string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i+1] || ' ' ||
                     string_split(text, ' ')[i+2])) AS term
  FROM documents
), postings AS (
  SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM postings GROUP BY term
), ntbl AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
  SELECT term, length(bin(n_docs // df)) - 1 AS idf_bits
  FROM dft, ntbl
  WHERE length(bin(n_docs // df)) - 1 >= 1
), wpost AS (
  SELECT p.term, p.doc_id, p.tf * i.idf_bits AS w
  FROM postings p JOIN idf i USING (term)
), scores AS (
  SELECT q.doc_id AS q_id, d.doc_id, CAST(sum(q.w * d.w) AS BIGINT) AS score
  FROM wpost q JOIN wpost d USING (term)
  WHERE q.doc_id % {SR_QUERY_MOD} = {SR_QUERY_REM}
    AND d.doc_id <> q.doc_id
  GROUP BY q.doc_id, d.doc_id
)
SELECT q_id, CAST(rank AS INTEGER) AS rank, doc_id AS hit_id, score
FROM (
  SELECT q_id, doc_id, score,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
WHERE rank <= {SR_TOP_K}
"""


K_RRF = 60  # the standard reciprocal-rank-fusion dampening constant
HY_TOP_K = 5


def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid dense+sparse retrieval fused with Reciprocal Rank Fusion
    (Cormack et al.): score(q, d) = Σ_channels 1/(K_RRF + rank_channel),
    the standard way RAG stacks combine an embedding ANN channel with a
    BM25-family lexical channel without calibrating their incomparable raw
    scores. Queries are vec_id/doc_id < N_QUERIES (the tables are 1:1 on
    id), the dense channel ranks by the bit-exact integer-micros cosine,
    the sparse channel by the integer tf·idf of _weighted_postings; both
    ranks tie-break on candidate id, so every rank is engine-deterministic
    and the fused score is two IEEE divisions plus one addition of
    identical binary64 values — bit-identical cross-engine with no
    rounding.

    Scale shape: the dense channel here is the brute-force ranking (the
    correctness baseline — production swaps in knn_ivf's candidate set,
    same fusion from there on); the sparse channel is the posting-list
    equi-join bounded by idf pruning. Fusion itself is a LEFT join of the
    complete dense ranking against the sparse ranking on (q, candidate) —
    per-query top-k windows, never a global sort. [extension]"""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("mvec").alias("qvec")
    )
    c = e.select(F.col("vec_id").alias("hit_id"), F.col("mvec").alias("cvec"))
    dw = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("hit_id"))
    dense = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("hit_id") != F.col("q_id"))
        .select(
            "q_id",
            "hit_id",
            _cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
        .withColumn("r_dense", F.row_number().over(dw))
        .select("q_id", "hit_id", "r_dense")
    )
    wpost = _weighted_postings(spark, sf_dir)
    sq = wpost.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("q_id"), "term", F.col("w").alias("wq")
    )
    sscores = (
        sq.join(wpost, "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", F.col("doc_id").alias("hit_id"))
        .agg(F.sum(F.col("wq") * F.col("w")).alias("score"))
    )
    sw = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("hit_id"))
    sparse = sscores.withColumn("r_sparse", F.row_number().over(sw)).select(
        "q_id", "hit_id", "r_sparse"
    )
    fused = dense.join(sparse, ["q_id", "hit_id"], "left")
    rrf = F.lit(1e0) / (F.lit(K_RRF) + F.col("r_dense")) + F.coalesce(
        F.lit(1e0) / (F.lit(K_RRF) + F.col("r_sparse")), F.lit(0e0)
    )
    fw = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("hit_id"))
    return (
        fused.withColumn("rrf", rrf)
        .withColumn("fused_rank", F.row_number().over(fw))
        .filter(F.col("fused_rank") <= HY_TOP_K)
        .select("q_id", "hit_id", "fused_rank", "rrf", "r_dense", "r_sparse")
    )


QUERIES["hybrid_retrieval_rrf"] = hybrid_retrieval_rrf

ORACLE["hybrid_retrieval_rrf"] = f"""
WITH e AS (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
), dense AS (
  SELECT q_id, hit_id,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY cos DESC, hit_id ASC) AS INTEGER)
           AS r_dense
  FROM (
    SELECT a.vec_id AS q_id, b.vec_id AS hit_id,
           {_cos_sql("a.mvec", "b.mvec")} AS cos
    FROM e a JOIN e b ON b.vec_id <> a.vec_id
    WHERE a.vec_id < {N_QUERIES}
  )
), occ AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                i -> string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i+1] || ' ' ||
                     string_split(text, ' ')[i+2])) AS term
  FROM documents
), postings AS (
  SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM postings GROUP BY term
), ntbl AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
  SELECT term, length(bin(n_docs // df)) - 1 AS idf_bits
  FROM dft, ntbl
  WHERE length(bin(n_docs // df)) - 1 >= 1
), wpost AS (
  SELECT p.term, p.doc_id, p.tf * i.idf_bits AS w
  FROM postings p JOIN idf i USING (term)
), sscores AS (
  SELECT q.doc_id AS q_id, d.doc_id AS hit_id, sum(q.w * d.w) AS score
  FROM wpost q JOIN wpost d USING (term)
  WHERE q.doc_id < {N_QUERIES} AND d.doc_id <> q.doc_id
  GROUP BY q.doc_id, d.doc_id
), sparse AS (
  SELECT q_id, hit_id,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY score DESC, hit_id ASC) AS INTEGER)
           AS r_sparse
  FROM sscores
), fused AS (
  SELECT d.q_id, d.hit_id, d.r_dense, s.r_sparse,
         1e0 / ({K_RRF} + d.r_dense)
           + coalesce(1e0 / ({K_RRF} + s.r_sparse), 0e0) AS rrf
  FROM dense d LEFT JOIN sparse s
    ON s.q_id = d.q_id AND s.hit_id = d.hit_id
)
SELECT q_id, hit_id, fused_rank, rrf, r_dense, r_sparse
FROM (
  SELECT q_id, hit_id, r_dense, r_sparse, rrf,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY rrf DESC, hit_id ASC) AS INTEGER)
           AS fused_rank
  FROM fused
)
WHERE fused_rank <= {HY_TOP_K}
"""


# --- product quantization (PQ codes + ADC search + exact re-rank) ------------
PQ_SUB = 4  # subspaces
PQ_SUBDIM = 16  # dims per subspace (embeddings are 64-dim)
PQ_K = 16  # codebook entries per subspace (init = subvectors of vec_id < PQ_K)
PQ_SHORTLIST = 100  # ADC shortlist size fed to the exact re-rank stage


def _pq_l2(a, b) -> F.Column:
    """Exact integer L2 over micro subvectors: every partial stays far
    below 2^53, so the double fold is exact in any order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_subvectors(e: DataFrame) -> DataFrame:
    """(vec_id, sub_id, svec): each vector split into PQ_SUB contiguous
    PQ_SUBDIM-dim subvectors — map-side explode in the scan stage."""
    return e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_SUB - 1))).alias("sub_id"),
        "mvec",
    ).select(
        "vec_id",
        "sub_id",
        F.slice(
            "mvec", F.col("sub_id") * PQ_SUBDIM + 1, PQ_SUBDIM
        ).alias("svec"),
    )


def _pq_codebook(e: DataFrame) -> DataFrame:
    """Per-subspace codebook: subvectors of the first PQ_K vectors — the
    deterministic k-means stand-in (the knn_ivf argument: the quantization
    MECHANICS are the operator; training would slot kmeans_fit here)."""
    return _pq_subvectors(e.filter(F.col("vec_id") < PQ_K)).select(
        F.col("vec_id").alias("code"),
        "sub_id",
        F.col("svec").alias("cvec"),
    )


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011): each vector's
    PQ_SUB subvectors are assigned to their nearest codebook entry by
    exact integer L2, ties → lower code. Output is flat (vec_id, sub_id,
    code, dist_sq) rows — dist_sq is the per-subspace quantization error
    whose sum is the vector's total reconstruction error.

    Scale shape: subvectors explode map-side; the (PQ_SUB·PQ_K)-row
    codebook broadcasts; assignment packs (dist, code) into ONE BIGINT
    (dist·PQ_K + code — argmin with the lower-code tie rule as a plain
    integer min, which stays HASH-aggregable with a map-side partial,
    where min-of-struct would force a SortAggregate) — one hash exchange
    of K-fold compressed rows, no window sort anywhere. At 100 TB the
    codes table (vec_id + PQ_SUB bytes) is the ANN index payload: 64 dims
    × 8 bytes collapse to 4 codes. [extension]"""
    e = _emb(spark, sf_dir)
    scored = _pq_subvectors(e).join(F.broadcast(_pq_codebook(e)), "sub_id")
    packed = _pq_l2("svec", "cvec").cast("long") * PQ_K + F.col("code")
    return (
        scored.select("vec_id", "sub_id", packed.alias("dc"))
        .groupBy("vec_id", "sub_id")
        .agg(F.min("dc").alias("m"))
        .select(
            "vec_id",
            "sub_id",
            F.expr(f"m % {PQ_K}").alias("code"),
            F.expr(f"m div {PQ_K}").alias("dist_sq"),
        )
    )


def _pq_adc_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, adc_dist_sq) for every query × candidate: each
    query's per-subspace lookup table of exact integer L2 distances to
    every codebook entry broadcasts, the codes table joins it map-side on
    (sub_id, code), and one hash exchange on (query_id, vec_id) folds the
    PQ_SUB partial distances."""
    e = _emb(spark, sf_dir)
    codes = pq_codes(spark, sf_dir)
    lut = (
        _pq_subvectors(e.filter(F.col("vec_id") < N_QUERIES))
        .select(
            F.col("vec_id").alias("query_id"),
            "sub_id",
            F.col("svec").alias("qvec"),
        )
        .join(F.broadcast(_pq_codebook(e)), "sub_id")
        .select(
            "query_id",
            "sub_id",
            "code",
            _pq_l2("qvec", "cvec").cast("long").alias("pd"),
        )
    )
    return (
        codes.join(F.broadcast(lut), ["sub_id", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd").alias("adc_dist_sq"))
    )


def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k search: a candidate's ADC distance is
    the sum of the PQ_SUB lookup-table entries its codes select — the
    IVF-PQ search arithmetic, approximate w.r.t. true L2 (the query meets
    codes, never raw candidate vectors) but fully deterministic: integer
    distances, BIGINT sums, (dist ASC, cand_id ASC) tie order.

    Scale shape: see _pq_adc_dists (broadcast LUT + one hash exchange);
    the top-k window partitions per query. The corpus' raw vectors are
    read exactly once (to encode); search itself touches only codes — the
    entire point of PQ at 100 TB. [extension]"""
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist_sq"), F.asc("vec_id")
    )
    return (
        _pq_adc_dists(spark, sf_dir)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            "adc_dist_sq",
            "rank",
        )
    )


def pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production two-stage path: ADC shortlists PQ_SHORTLIST
    candidates per query from codes alone, then ONLY those shortlisted
    vectors are fetched for an exact integer-L2 re-rank to top-k — the
    standard IVF-PQ + re-rank pipeline, where the expensive full-vector
    read is bounded by |queries|·PQ_SHORTLIST regardless of corpus size.

    Exact everywhere it matters: the shortlist cut is deterministic
    (ADC ASC, cand ASC), the re-rank distance is the exact integer L2 the
    brute-force scan would compute, so a hit in the shortlist ranks
    exactly as brute force would rank it. [extension]"""
    e = _emb(spark, sf_dir)
    ws = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist_sq"), F.asc("vec_id")
    )
    short = (
        _pq_adc_dists(spark, sf_dir)
        .withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= PQ_SHORTLIST)
        .select("query_id", "vec_id")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("mvec").alias("qvec")
    )
    rer = (
        short.join(e.select("vec_id", "mvec"), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _pq_l2("mvec", "qvec").cast("long").alias("dist_sq"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.asc("dist_sq"), F.asc("cand_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "dist_sq", "rank")
    )


def pq_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the shipped PQ search path (ADC shortlist → exact
    re-rank) against the EXACT-L2 top-k (the retrieval_eval_recall
    pattern, but on PQ's own metric — L2, not cosine, so the baseline is
    computed inline rather than reusing the cosine kNN): per query,
    |exact-L2 top-K ∩ re-ranked top-K| and the recall in integer micro
    units (round-half-up, no double anywhere).

    The exact side is one broadcast of the N_QUERIES query vectors against
    the corpus — the same bounded cost knn_bruteforce pays; full-dim
    integer L2 partials stay far below 2^53, so the fold is exact."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("mvec").alias("qvec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_sq"), F.asc("cand_id")
    )
    exact = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _pq_l2("mvec", "qvec").cast("long").alias("dist_sq"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "cand_id")
    )
    approx = pq_rerank_topk(spark, sf_dir).select("query_id", "cand_id")
    hits = (
        exact.join(approx, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    base = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        )
        .withColumn(
            "recall_micro",
            F.expr("(2 * n_hit * 1000000 + n_exact) DIV (2 * n_exact)"),
        )
    )


QUERIES["pq_codes"] = pq_codes
QUERIES["pq_adc_topk"] = pq_adc_topk
QUERIES["pq_rerank_topk"] = pq_rerank_topk
QUERIES["pq_eval_recall"] = pq_eval_recall

# Shared CTE chain (MATERIALIZED per playbook rule 10: several downstream
# CTEs re-reference these, and DuckDB inlines plain CTEs per reference).
_PQ_BASE_SQL = f"""
pqe AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> round(x::DOUBLE * 1000000)) AS mvec
  FROM embeddings
), pqsv AS MATERIALIZED (
  SELECT vec_id, i AS sub_id,
         list_slice(mvec, {PQ_SUBDIM} * i + 1,
                    {PQ_SUBDIM} * i + {PQ_SUBDIM}) AS svec
  FROM (SELECT vec_id, mvec, unnest(range({PQ_SUB})) AS i FROM pqe)
), pqcb AS MATERIALIZED (
  SELECT vec_id AS code, sub_id, svec AS cvec FROM pqsv
  WHERE vec_id < {PQ_K}
), pqbest AS MATERIALIZED (
  SELECT vec_id, sub_id, code, d FROM (
    SELECT s.vec_id, s.sub_id, c.code,
           CAST(list_sum(list_transform(list_zip(s.svec, c.cvec),
                p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d,
           row_number() OVER (PARTITION BY s.vec_id, s.sub_id
                              ORDER BY list_sum(list_transform(
                                list_zip(s.svec, c.cvec),
                                p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                              c.code ASC) AS rn
    FROM pqsv s JOIN pqcb c USING (sub_id)
  ) WHERE rn = 1
)"""

_PQ_ADC_SQL = f"""{_PQ_BASE_SQL},
pqlut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, q.sub_id, c.code,
         CAST(list_sum(list_transform(list_zip(q.svec, c.cvec),
              p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS pd
  FROM pqsv q JOIN pqcb c USING (sub_id)
  WHERE q.vec_id < {N_QUERIES}
),
pqdists AS MATERIALIZED (
  SELECT l.query_id, b.vec_id AS cand_id, CAST(sum(l.pd) AS BIGINT)
           AS adc_dist_sq
  FROM pqbest b
  JOIN pqlut l ON l.sub_id = b.sub_id AND l.code = b.code
  WHERE l.query_id <> b.vec_id
  GROUP BY l.query_id, b.vec_id
)"""

_PQ_EXACT_L2_SQL = f"""
pqexact AS MATERIALIZED (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(e.mvec, q.mvec),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) ASC,
                      e.vec_id ASC) AS rn
    FROM pqe e
    JOIN (SELECT vec_id, mvec FROM pqe WHERE vec_id < {N_QUERIES}) q
      ON e.vec_id <> q.vec_id
  ) WHERE rn <= {TOP_K}
)"""

ORACLE["pq_codes"] = f"""
WITH {_PQ_BASE_SQL}
SELECT vec_id, sub_id, code, d AS dist_sq FROM pqbest
"""

ORACLE["pq_adc_topk"] = f"""
WITH {_PQ_ADC_SQL}
SELECT query_id, cand_id, adc_dist_sq, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT query_id, cand_id, adc_dist_sq,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist_sq ASC, cand_id ASC) AS rank
  FROM pqdists
) WHERE rank <= {TOP_K}
"""

_PQ_RERANK_SQL = f"""{_PQ_ADC_SQL},
pqshort AS MATERIALIZED (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist_sq ASC, cand_id ASC) AS rn
    FROM pqdists
  ) WHERE rn <= {PQ_SHORTLIST}
),
pqrerank AS MATERIALIZED (
  SELECT s.query_id, s.cand_id,
         CAST(list_sum(list_transform(list_zip(e.mvec, q.mvec),
              p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist_sq
  FROM pqshort s
  JOIN pqe e ON e.vec_id = s.cand_id
  JOIN pqe q ON q.vec_id = s.query_id
),
pqreranked AS MATERIALIZED (
  SELECT query_id, cand_id, dist_sq,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist_sq ASC, cand_id ASC) AS rank
  FROM pqrerank
)"""

ORACLE["pq_rerank_topk"] = f"""
WITH {_PQ_RERANK_SQL}
SELECT query_id, cand_id, dist_sq, CAST(rank AS INTEGER) AS rank
FROM pqreranked WHERE rank <= {TOP_K}
"""

ORACLE["pq_eval_recall"] = f"""
WITH {_PQ_RERANK_SQL},
{_PQ_EXACT_L2_SQL},
pqapprox AS (
  SELECT query_id, cand_id FROM pqreranked WHERE rank <= {TOP_K}
), pqrbase AS (
  SELECT query_id, count(*) AS n_exact FROM pqexact GROUP BY query_id
), pqrhits AS (
  SELECT e.query_id, count(*) AS n_hit
  FROM pqexact e JOIN pqapprox a USING (query_id, cand_id)
  GROUP BY e.query_id
)
SELECT b.query_id, b.n_exact,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       (2 * CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000 + b.n_exact)
         // (2 * b.n_exact) AS recall_micro
FROM pqrbase b LEFT JOIN pqrhits h USING (query_id)
"""


def ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search (Jégou et al. 2011 §V, the FAISS IVFADC layout): a
    coarse inverted index prunes the corpus to each query's NPROBE probed
    buckets, and ADC over PQ codes ranks ONLY those candidates — the
    composition of knn_ivf's pruning with pq_adc_topk's arithmetic, which
    is the shape a 100 TB ANN index actually runs. Search cost is
    ∝ (probed fraction) × |codes|, never the corpus, and raw vectors are
    never read at search time at all: the scan feeding the search stage
    touches only the (vec_id, 4-code) index rows.

    Deterministic end-to-end: coarse assignment is an exact-integer-L2
    packed-BIGINT argmin (dist·N_CENTROIDS + id → plain MIN, which stays
    HASH-aggregable with a map-side partial; ties → lower centroid),
    probes use the same metric over the broadcast centroid table, ADC
    partials are BIGINT, final order (adc ASC, cand ASC). [extension]"""
    e = _emb(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("mvec").alias("cvec")
    )
    # coarse assignment: nearest centroid by exact integer L2.  Packed
    # argmin bound: 64 dims × (2e6)² × 8 centroids ≈ 2.1e15 < 2^53.
    packed = (
        _pq_l2("mvec", "cvec").cast("long") * N_CENTROIDS
        + F.col("centroid_id")
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", packed.alias("dc"))
        .groupBy("vec_id")
        .agg(F.min("dc").alias("m"))
        .select("vec_id", F.expr(f"m % {N_CENTROIDS}").alias("bucket"))
    )
    # each query probes its NPROBE nearest coarse buckets (same metric)
    probe_w = Window.partitionBy("query_id").orderBy(
        F.asc("cl2"), F.asc("centroid_id")
    )
    probes = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "mvec")
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "centroid_id",
            _pq_l2("mvec", "cvec").cast("long").alias("cl2"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= NPROBE)
        .select("query_id", F.col("centroid_id").alias("bucket"))
    )
    # candidates = ids in probed buckets; ADC over their codes only.
    # probes is |queries|·NPROBE rows — broadcast it (the stats coming out
    # of the window would otherwise default this to a shuffled join).
    cands = (
        F.broadcast(probes).join(assigned, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
    )
    lut = (
        _pq_subvectors(e.filter(F.col("vec_id") < N_QUERIES))
        .select(
            F.col("vec_id").alias("query_id"),
            "sub_id",
            F.col("svec").alias("qvec"),
        )
        .join(F.broadcast(_pq_codebook(e)), "sub_id")
        .select(
            "query_id",
            "sub_id",
            "code",
            _pq_l2("qvec", "cvec").cast("long").alias("pd"),
        )
    )
    adc = (
        cands.join(pq_codes(spark, sf_dir), "vec_id")
        .join(F.broadcast(lut), ["query_id", "sub_id", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd").alias("adc_dist_sq"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist_sq"), F.asc("vec_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            "adc_dist_sq",
            "rank",
        )
    )


QUERIES["ivf_pq_topk"] = ivf_pq_topk

# Oracle computes the same value by the simpler route: full-pair ADC
# (pqdists) restricted to the IVF candidate set — value-identical to the
# engine's candidates-only shape, because ADC(q, c) does not depend on
# which bucket c sits in.
ORACLE["ivf_pq_topk"] = f"""
WITH {_PQ_ADC_SQL},
ivfcent AS MATERIALIZED (
  SELECT vec_id AS centroid_id, mvec AS cvec FROM pqe
  WHERE vec_id < {N_CENTROIDS}
),
ivfassign AS MATERIALIZED (
  SELECT vec_id, centroid_id AS bucket FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(e.mvec, c.cvec),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) ASC,
                      c.centroid_id ASC) AS rn
    FROM pqe e CROSS JOIN ivfcent c
  ) WHERE rn = 1
),
ivfprobe AS MATERIALIZED (
  SELECT query_id, centroid_id AS bucket FROM (
    SELECT q.vec_id AS query_id, c.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(q.mvec, c.cvec),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) ASC,
                      c.centroid_id ASC) AS rn
    FROM pqe q CROSS JOIN ivfcent c WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {NPROBE}
),
ivfadc AS (
  SELECT d.query_id, d.cand_id, d.adc_dist_sq
  FROM pqdists d
  JOIN ivfassign a ON a.vec_id = d.cand_id
  JOIN ivfprobe p ON p.query_id = d.query_id AND p.bucket = a.bucket
)
SELECT query_id, cand_id, adc_dist_sq, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT query_id, cand_id, adc_dist_sq,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist_sq ASC, cand_id ASC) AS rank
  FROM ivfadc
) WHERE rank <= {TOP_K}
"""


MRL_DIM = 16  # truncated prefix dimensionality (Matryoshka-style)


def matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation evaluation (Kusupati et al. 2022): recall@K
    of exact-L2 top-k computed on the first MRL_DIM dims against the
    full-dimension exact top-k — the measurement that decides whether a
    truncate-then-rerank retrieval stack (search on the cheap prefix,
    re-rank on the full vector) is safe for a given corpus. Per query:
    overlap count and recall in integer micro units (round-half-up).

    Determinism: both sides are exact integer-L2 rankings with
    (dist ASC, id ASC) tie order; the recall quotient is the repo's
    integer-rational rounding — no double anywhere.

    Scale shape: two broadcast-query scans of the corpus (the same
    bounded cost knn_bruteforce pays — |queries| is the small side); at
    production scale the truncated side is where an IVF/PQ index would
    slot in, cutting the full-dim reads to |queries|·K. [extension]"""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("mvec").alias("qvec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_sq"), F.asc("cand_id")
    )

    def _topk(dist: F.Column) -> DataFrame:
        return (
            e.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("cand_id"),
                dist.cast("long").alias("dist_sq"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "cand_id")
        )

    full = _topk(_pq_l2("mvec", "qvec"))
    trunc = _topk(
        _pq_l2(
            F.slice("mvec", 1, MRL_DIM), F.slice("qvec", 1, MRL_DIM)
        )
    )
    hits = (
        full.join(trunc, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    base = full.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        )
        .withColumn(
            "recall_micro",
            F.expr("(2 * n_hit * 1000000 + n_exact) DIV (2 * n_exact)"),
        )
    )


QUERIES["matryoshka_recall"] = matryoshka_recall

_MRL_L2 = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
)

ORACLE["matryoshka_recall"] = f"""
WITH me AS MATERIALIZED (
  SELECT vec_id, {_MVEC_SQL} AS mvec FROM embeddings
), mq AS MATERIALIZED (
  SELECT vec_id AS query_id, mvec AS qvec FROM me
  WHERE vec_id < {N_QUERIES}
), mfull AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, e.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_MRL_L2.format(a="e.mvec", b="q.qvec")} ASC,
                      e.vec_id ASC) AS rn
    FROM me e JOIN mq q ON e.vec_id <> q.query_id
  ) WHERE rn <= {TOP_K}
), mtrunc AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, e.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_MRL_L2.format(
                 a=f"list_slice(e.mvec, 1, {MRL_DIM})",
                 b=f"list_slice(q.qvec, 1, {MRL_DIM})")} ASC,
                      e.vec_id ASC) AS rn
    FROM me e JOIN mq q ON e.vec_id <> q.query_id
  ) WHERE rn <= {TOP_K}
), mbase AS (
  SELECT query_id, count(*) AS n_exact FROM mfull GROUP BY query_id
), mhits AS (
  SELECT f.query_id, count(*) AS n_hit
  FROM mfull f JOIN mtrunc t USING (query_id, cand_id)
  GROUP BY f.query_id
)
SELECT b.query_id, b.n_exact,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       (2 * CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000 + b.n_exact)
         // (2 * b.n_exact) AS recall_micro
FROM mbase b LEFT JOIN mhits h USING (query_id)
"""


def ann_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted ANN index artifact, one row per vector: IVF coarse
    bucket + the PQ code word as an ordered array — exactly the table an
    IVF-PQ stack writes once and serves forever (ivf_pq_topk's search
    reads only this plus the tiny codebook). 64 float dims collapse to
    one bucket id + PQ_SUB small ints per vector: the 100 TB corpus'
    index fits in ~1/60 of the raw embedding bytes.

    The code word is assembled with sort_array(collect_list(struct)) —
    the struct sorts on sub_id first, so the aggregation order never
    matters — and ships as a '|'-joined STRING, not array<long>: the
    driver's value canonicalizer can't sort list cells (the round-1
    sequence_assembly lesson, enforced by test_oracle_portability).
    [extension]"""
    e = _emb(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("mvec").alias("cvec")
    )
    packed = (
        _pq_l2("mvec", "cvec").cast("long") * N_CENTROIDS
        + F.col("centroid_id")
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", packed.alias("dc"))
        .groupBy("vec_id")
        .agg(F.min("dc").alias("m"))
        .select("vec_id", F.expr(f"m % {N_CENTROIDS}").alias("bucket"))
    )
    codes = (
        pq_codes(spark, sf_dir)
        .groupBy("vec_id")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("sub_id", "code"))
                    ),
                    lambda s: s["code"].cast("string"),
                ),
            ).alias("codes")
        )
    )
    return assigned.join(codes, "vec_id").select("vec_id", "bucket", "codes")


QUERIES["ann_index_build"] = ann_index_build

ORACLE["ann_index_build"] = f"""
WITH {_PQ_BASE_SQL},
ivfcent2 AS MATERIALIZED (
  SELECT vec_id AS centroid_id, mvec AS cvec FROM pqe
  WHERE vec_id < {N_CENTROIDS}
),
ivfassign2 AS (
  SELECT vec_id, centroid_id AS bucket FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(e.mvec, c.cvec),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) ASC,
                      c.centroid_id ASC) AS rn
    FROM pqe e CROSS JOIN ivfcent2 c
  ) WHERE rn = 1
),
cw AS (
  SELECT vec_id,
         array_to_string(list(code ORDER BY sub_id), '|') AS codes
  FROM pqbest GROUP BY vec_id
)
SELECT a.vec_id, a.bucket, c.codes
FROM ivfassign2 a JOIN cw c USING (vec_id)
"""


RM3_TERMS = 5  # expansion terms mined from the feedback docs per query


def rm3_expanded_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (RM3, Lavrenko & Croft lineage): run the
    sparse retrieval once, treat its top-SR_TOP_K hits as feedback docs,
    mine the RM3_TERMS heaviest terms from their postings (Σw over the
    feedback set, ties → term asc), and re-score the corpus with the
    MIXED query model w' = 2·w_original + w_expansion — the classic
    recall-booster a lexical RAG channel runs when first-pass recall is
    thin. Integer end to end: weights are the tf·idf_bits integers the
    index already carries, the mix is a fixed 2:1 integer combination,
    so the final scores stay value-level oracle-checkable.

    Scale shape: round 1 is sparse_retrieval_topk's bounded posting join;
    the feedback-term mining touches only |queries|·SR_TOP_K docs'
    postings; round 2 is the same posting equi-join with ≤ RM3_TERMS
    extra terms per query — still ∝ postings, never |q|·|corpus|.
    [extension]"""
    wpost = _weighted_postings(spark, sf_dir)
    fb = sparse_retrieval_topk(spark, sf_dir).select(
        "q_id", F.col("hit_id").alias("doc_id")
    )
    exp_w = (
        fb.join(wpost, "doc_id")
        .groupBy("q_id", "term")
        .agg(F.sum("w").alias("we"))
    )
    wexp = Window.partitionBy("q_id").orderBy(F.desc("we"), F.asc("term"))
    exp_top = (
        exp_w.withColumn("rn", F.row_number().over(wexp))
        .filter(F.col("rn") <= RM3_TERMS)
        .select("q_id", "term", "we")
    )
    q = wpost.filter(
        F.col("doc_id") % SR_QUERY_MOD == SR_QUERY_REM
    ).select(F.col("doc_id").alias("q_id"), "term", F.col("w").alias("wq"))
    combined = (
        q.join(exp_top, ["q_id", "term"], "full")
        .select(
            "q_id",
            "term",
            (
                2 * F.coalesce("wq", F.lit(0))
                + F.coalesce("we", F.lit(0))
            ).alias("qw"),
        )
    )
    scores = (
        combined.join(wpost, "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("qw") * F.col("w")).alias("score"))
    )
    win = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= SR_TOP_K)
        .select("q_id", "rank", F.col("doc_id").alias("hit_id"), "score")
    )


QUERIES["rm3_expanded_retrieval"] = rm3_expanded_retrieval

ORACLE["rm3_expanded_retrieval"] = f"""
WITH occ AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                i -> string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i+1] || ' ' ||
                     string_split(text, ' ')[i+2])) AS term
  FROM documents
), postings AS (
  SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM postings GROUP BY term
), ntbl AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
  SELECT term, length(bin(n_docs // df)) - 1 AS idf_bits
  FROM dft, ntbl
  WHERE length(bin(n_docs // df)) - 1 >= 1
), wpost AS MATERIALIZED (
  SELECT p.term, p.doc_id, p.tf * i.idf_bits AS w
  FROM postings p JOIN idf i USING (term)
), r1scores AS (
  SELECT q.doc_id AS q_id, d.doc_id, CAST(sum(q.w * d.w) AS BIGINT) AS score
  FROM wpost q JOIN wpost d USING (term)
  WHERE q.doc_id % {SR_QUERY_MOD} = {SR_QUERY_REM}
    AND d.doc_id <> q.doc_id
  GROUP BY q.doc_id, d.doc_id
), fb AS (
  SELECT q_id, doc_id FROM (
    SELECT q_id, doc_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM r1scores
  ) WHERE rank <= {SR_TOP_K}
), expw AS (
  SELECT f.q_id, p.term, CAST(sum(p.w) AS BIGINT) AS we
  FROM fb f JOIN wpost p USING (doc_id)
  GROUP BY f.q_id, p.term
), exptop AS (
  SELECT q_id, term, we FROM (
    SELECT q_id, term, we,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY we DESC, term ASC) AS rn
    FROM expw
  ) WHERE rn <= {RM3_TERMS}
), orig AS (
  SELECT doc_id AS q_id, term, w AS wq FROM wpost
  WHERE doc_id % {SR_QUERY_MOD} = {SR_QUERY_REM}
), combined AS (
  SELECT coalesce(o.q_id, e.q_id) AS q_id,
         coalesce(o.term, e.term) AS term,
         2 * coalesce(o.wq, 0) + coalesce(e.we, 0) AS qw
  FROM orig o FULL OUTER JOIN exptop e
    ON o.q_id = e.q_id AND o.term = e.term
), r2scores AS (
  SELECT c.q_id, d.doc_id, CAST(sum(c.qw * d.w) AS BIGINT) AS score
  FROM combined c JOIN wpost d USING (term)
  WHERE d.doc_id <> c.q_id
  GROUP BY c.q_id, d.doc_id
)
SELECT q_id, CAST(rank AS INTEGER) AS rank, doc_id AS hit_id, score
FROM (
  SELECT q_id, doc_id, score,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM r2scores
) WHERE rank <= {SR_TOP_K}
"""


def ivf_pq_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the full IVF-PQ search path against exact L2 — the
    end-to-end eval closing the ANN matrix (retrieval_eval_recall covers
    IVF/cosine, pq_eval_recall covers PQ+re-rank; this one measures the
    COMPOSED pruning+quantization loss a production IVFADC deployment
    actually pays). Per query: |exact-L2 top-K ∩ ivf_pq_topk| and the
    recall in integer micro units. On this corpus the number is low by
    construction (random embeddings + ADC-only ranking) — the eval's job
    is to report exactly that before anyone trusts the index.
    [extension]"""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("mvec").alias("qvec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_sq"), F.asc("cand_id")
    )
    exact = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _pq_l2("mvec", "qvec").cast("long").alias("dist_sq"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "cand_id")
    )
    approx = ivf_pq_topk(spark, sf_dir).select("query_id", "cand_id")
    hits = (
        exact.join(approx, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    base = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        )
        .withColumn(
            "recall_micro",
            F.expr("(2 * n_hit * 1000000 + n_exact) DIV (2 * n_exact)"),
        )
    )


QUERIES["ivf_pq_eval_recall"] = ivf_pq_eval_recall

ORACLE["ivf_pq_eval_recall"] = f"""
WITH {_PQ_ADC_SQL},
{_PQ_EXACT_L2_SQL.lstrip().lstrip(",")},
ivfcent3 AS MATERIALIZED (
  SELECT vec_id AS centroid_id, mvec AS cvec FROM pqe
  WHERE vec_id < {N_CENTROIDS}
),
ivfassign3 AS MATERIALIZED (
  SELECT vec_id, centroid_id AS bucket FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(e.mvec, c.cvec),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) ASC,
                      c.centroid_id ASC) AS rn
    FROM pqe e CROSS JOIN ivfcent3 c
  ) WHERE rn = 1
),
ivfprobe3 AS MATERIALIZED (
  SELECT query_id, centroid_id AS bucket FROM (
    SELECT q.vec_id AS query_id, c.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(q.mvec, c.cvec),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) ASC,
                      c.centroid_id ASC) AS rn
    FROM pqe q CROSS JOIN ivfcent3 c WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {NPROBE}
),
ivfapprox AS (
  SELECT query_id, cand_id FROM (
    SELECT d.query_id, d.cand_id, d.adc_dist_sq,
           row_number() OVER (PARTITION BY d.query_id
                              ORDER BY d.adc_dist_sq ASC, d.cand_id ASC)
             AS rank
    FROM pqdists d
    JOIN ivfassign3 a ON a.vec_id = d.cand_id
    JOIN ivfprobe3 p ON p.query_id = d.query_id AND p.bucket = a.bucket
  ) WHERE rank <= {TOP_K}
), ivfrb AS (
  SELECT query_id, count(*) AS n_exact FROM pqexact GROUP BY query_id
), ivfrh AS (
  SELECT e.query_id, count(*) AS n_hit
  FROM pqexact e JOIN ivfapprox a USING (query_id, cand_id)
  GROUP BY e.query_id
)
SELECT b.query_id, b.n_exact,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       (2 * CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000 + b.n_exact)
         // (2 * b.n_exact) AS recall_micro
FROM ivfrb b LEFT JOIN ivfrh h USING (query_id)
"""


# --- sparse tf-cosine document pairs -----------------------------------------
SC_DF_CAP = 20  # drop terms in more than SC_DF_CAP docs (hot boilerplate)
SC_DOT_MIN = 3  # emit pairs with integer tf-dot >= this (output bound)


def sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise sparse COSINE similarity over tf vectors of word 3-grams —
    the classic bag-of-terms document-similarity operator, complementing
    the set-based Jaccard (ngram_jaccard_pairs: presence only) and the
    dense embedding cosine (knn_*): repeated grams WEIGHT the match here.
    Terms occurring in more than SC_DF_CAP docs are dropped from the
    index (standard df pruning — boilerplate carries no similarity
    signal), which also bounds the posting self-join fan-out per term at
    SC_DF_CAP², keeping candidate generation shuffle-linear like
    minhash_lsh_pairs / winnowing_dup_candidates. Vectors are defined
    over the PRUNED vocabulary (dot and norms consistently).

    Exactness: tf, the dot product, and both squared norms are exact
    BIGINT aggregates; cosine = dot / (sqrt(ssa)·sqrt(ssb)) is shared
    binary64 on exact integer inputs (the vol_5d sqrt precedent). The
    integer dot-product floor SC_DOT_MIN bounds the output exactly.
    [extension]"""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split("text", " ").alias("ws"))
    n = F.greatest(F.size("ws") - 2, F.lit(0))
    tri = F.arrays_zip(
        F.slice("ws", 1, n), F.slice("ws", 2, n), F.slice("ws", 3, n)
    )
    occ = base.select("doc_id", F.explode(tri).alias("g")).select(
        "doc_id",
        F.concat_ws(" ", F.col("g.0"), F.col("g.1"), F.col("g.2")).alias(
            "term"
        ),
    )
    tf = occ.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    post = tf.join(df.filter(F.col("df") <= SC_DF_CAP), "term").select(
        "doc_id", "term", "tf"
    )
    ssq = post.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("ssq")
    )
    a = post.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("tf").alias("tfa")
    )
    b = post.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("tf").alias("tfb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).alias("dot"))
        .filter(F.col("dot") >= SC_DOT_MIN)
    )
    sa = ssq.select(F.col("doc_id").alias("doc_a"), F.col("ssq").alias("ssa"))
    sb = ssq.select(F.col("doc_id").alias("doc_b"), F.col("ssq").alias("ssb"))
    return (
        dots.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "dot",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("ssa").cast("double"))
                    * F.sqrt(F.col("ssb").cast("double"))
                )
            ).alias("cosine"),
        )
    )


QUERIES["sparse_cosine_pairs"] = sparse_cosine_pairs

ORACLE["sparse_cosine_pairs"] = f"""
WITH occ AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                i -> string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i+1] || ' ' ||
                     string_split(text, ' ')[i+2])) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY 1, 2),
post AS (
  SELECT doc_id, term, tf FROM tf
  WHERE term IN (SELECT term FROM tf GROUP BY term
                 HAVING count(*) <= {SC_DF_CAP})
),
ssq AS (
  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS ssq
  FROM post GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM post a JOIN post b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING sum(a.tf * b.tf) >= {SC_DOT_MIN}
)
SELECT d.doc_a, d.doc_b, d.dot,
       CAST(d.dot AS DOUBLE)
         / (sqrt(CAST(sa.ssq AS DOUBLE)) * sqrt(CAST(sb.ssq AS DOUBLE)))
         AS cosine
FROM dots d
JOIN ssq sa ON sa.doc_id = d.doc_a
JOIN ssq sb ON sb.doc_id = d.doc_b
"""
