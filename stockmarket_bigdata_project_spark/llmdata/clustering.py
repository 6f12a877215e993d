"""Iterative algorithms on DataFrames: k-means over the embedding table.

The genuinely iterative pattern (driver loop over cached DataFrames) that
SQL can't express — this is what produces REAL centroids for the IVF index
in similarity.py (whose registered query uses a deterministic stand-in so
it stays reproducible).

Pattern notes (the part that matters at 100 TB):
  * each iteration is ONE map-side pass over the corpus: centroids are
    broadcast, assignment is an argmin projection, the new centroids come
    from one hash aggregation — no shuffle of the corpus itself;
  * the assignment DataFrame is NOT cached between iterations — only the
    k×dims centroid table crosses iterations (collected to the driver,
    k·dims doubles, trivially small);
  * convergence is measured by the within-cluster cost, monotonically
    non-increasing (pinned in tests/test_clustering.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

K = 8
N_ITER = 3
DIMS = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )


def _assign(e: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Argmin-L2 assignment against broadcast literal centroids (map-side)."""
    dists = [
        F.aggregate(
            F.zip_with(
                "vec",
                F.array(*[F.lit(v) for v in c]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(f"d{i}")
        for i, c in enumerate(centroids)
    ]
    with_d = e.select("vec_id", "vec", *dists)
    dist_arr = F.array(*[F.col(f"d{i}") for i in range(len(centroids))])
    return with_d.select(
        "vec_id",
        "vec",
        (F.array_position(dist_arr, F.array_min(dist_arr)) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(dist_arr).alias("dist"),
    )


def kmeans_fit(spark: SparkSession, sf_dir: str) -> tuple[list[list[float]], list[float]]:
    """Run N_ITER Lloyd iterations; returns (centroids, per-iteration cost)."""
    e = _emb(spark, sf_dir).cache()
    # deterministic init: first K vectors by vec_id
    centroids = [
        r.vec for r in e.orderBy("vec_id").limit(K).collect()
    ]
    costs: list[float] = []
    for _ in range(N_ITER):
        assigned = _assign(e, centroids)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                F.sum("dist").alias("cost"),
                *[
                    F.sum(F.element_at("vec", d + 1)).alias(f"s{d}")
                    for d in range(DIMS)
                ],
            )
            .collect()
        )
        costs.append(sum(r["cost"] for r in stats))
        new_centroids = list(centroids)
        for r in stats:  # empty clusters keep their previous centroid
            new_centroids[r["cluster"]] = [r[f"s{d}"] / r["n"] for d in range(DIMS)]
        centroids = new_centroids
    e.unpersist()
    return centroids, costs


def kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: final assignment sizes + mean within-cluster
    distance after N_ITER iterations. Deterministic (fixed init, fixed
    iteration count) but not SQL-expressible → rows-only check; the
    monotone-cost property is pinned in tests."""
    centroids, _ = kmeans_fit(spark, sf_dir)
    e = _emb(spark, sf_dir)
    return (
        _assign(e, centroids)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("dist"), 6).alias("mean_sq_dist"),
        )
    )


QUERIES = {
    "kmeans_cluster_sizes": kmeans_cluster_sizes,
}

ORACLE: dict[str, str] = {}


# --- exact integer k-means (value-level oracle-checkable twin) ---------------
K_EXACT = 4  # clusters (init = vec_id < K_EXACT, the IVF stand-in idiom)
EXACT_ITERS = 2  # Lloyd iterations, unrolled in the DuckDB oracle


def _mvec_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings as exact integer micros (the similarity-layer basis)."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000000, 0)
        ).alias("mvec"),
    )


def _exact_assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Argmin-L2 assignment: dist² = Σ(aᵢ−bᵢ)² over integer micros —
    every partial stays far below 2^53, so the double fold is EXACT and
    the argmin (dist ASC, cid ASC) is engine-deterministic."""
    from pyspark.sql import Window

    dist = F.aggregate(
        F.zip_with("mvec", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    return (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "mvec", "cid", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _exact_centroids(assigned: DataFrame) -> DataFrame:
    """Integer centroid recompute: per (cluster, dim) the mean in micro
    units as a sign·round-half-away integer rational — no genuine real
    anywhere, so iteration k+1's distances are exact again."""
    dims = assigned.select(
        "cid", F.posexplode("mvec").alias("dim", "v")
    )
    stats = dims.groupBy("cid", "dim").agg(
        F.sum(F.col("v").cast("long")).alias("s"),
        F.count("*").alias("n"),
    )
    m = (
        F.when(F.col("s") >= 0, F.expr("(2 * s + n) DIV (2 * n)"))
        .otherwise(-F.expr("(2 * -s + n) DIV (2 * n)"))
        .alias("m")
    )
    per_dim = stats.select("cid", "dim", m)
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "m"))),
            lambda x: x["m"].cast("double"),
        ).alias("cvec")
    )


def kmeans_exact_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means made value-level oracle-checkable: fixed init (vec_id <
    K_EXACT), EXACT_ITERS Lloyd iterations in PURE INTEGER arithmetic
    (micro-unit vectors, exact integer distance folds, integer-rational
    centroid means), final assignment emitted as (vec_id, cluster_id,
    dist_sq BIGINT). The float/driver-loop kmeans_fit above remains the
    production path (real centroids for IVF); this twin proves the
    assignment/update mechanics value-for-value against DuckDB, the same
    exact-twin pattern as lm_perplexity_buckets vs the sampled form.

    Scale shape per iteration: centroids broadcast (K·D tiny), assignment
    map-side + one per-vector argmin window partitioned by vec_id (no
    corpus shuffle — AQE sees K·n rows keyed by vec_id), centroid update
    one (K·D)-group aggregate. The plan is the unrolled declarative form
    of the driver loop — nothing is collected."""
    e = _mvec_exact(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < K_EXACT).select(
        F.col("vec_id").alias("cid"), F.col("mvec").alias("cvec")
    )
    for _ in range(EXACT_ITERS):
        cent = _exact_centroids(_exact_assign(e, cent))
    final = _exact_assign(e, cent)
    return final.select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        F.col("dist").cast("long").alias("dist_sq"),
    )


QUERIES["kmeans_exact_assignments"] = kmeans_exact_assignments

_KM_MVEC_SQL = "list_transform(embedding, x -> round(x::DOUBLE * 1000000))"
_KM_DIST_SQL = (
    "list_sum(list_transform(list_zip(e.mvec, c.cvec),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])))"
)


def _km_round_sql(k: int) -> str:
    """a{k}: assignment against c{k-1}; c{k}: integer centroid recompute."""
    return f"""a{k} AS MATERIALIZED (
  SELECT vec_id, mvec, cid, dist FROM (
    SELECT e.vec_id, e.mvec, c.cid, {_KM_DIST_SQL} AS dist,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_KM_DIST_SQL} ASC, c.cid ASC) AS rn
    FROM e, c{k - 1} c
  ) WHERE rn = 1
), c{k} AS MATERIALIZED (
  SELECT cid,
         list_transform(
           list(m ORDER BY dim), x -> CAST(x AS DOUBLE)) AS cvec
  FROM (
    SELECT cid, dim,
           CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                ELSE -((2 * -s + n) // (2 * n)) END AS m
    FROM (
      SELECT cid, u.dim AS dim, CAST(sum(CAST(u.v AS BIGINT)) AS BIGINT) AS s,
             count(*) AS n
      FROM (SELECT cid,
                   unnest(list_transform(mvec, (x, i) -> {{v: x, dim: i}})) AS u
            FROM a{k})
      GROUP BY cid, u.dim
    )
  ) GROUP BY cid
)"""


_KM_ROUNDS_SQL = ",\n".join(_km_round_sql(k) for k in range(1, EXACT_ITERS + 1))

ORACLE["kmeans_exact_assignments"] = f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, {_KM_MVEC_SQL} AS mvec FROM embeddings
), c0 AS MATERIALIZED (
  SELECT vec_id AS cid, mvec AS cvec FROM e WHERE vec_id < {K_EXACT}
),
{_KM_ROUNDS_SQL}
SELECT vec_id, cid AS cluster_id, CAST(dist AS BIGINT) AS dist_sq FROM (
  SELECT e.vec_id, c.cid, {_KM_DIST_SQL} AS dist,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_KM_DIST_SQL} ASC, c.cid ASC) AS rn
  FROM e, c{EXACT_ITERS} c
) WHERE rn = 1
"""


def kmeans_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster inertia over the exact integer Lloyd assignments —
    the within-cluster sum of squared distances an elbow/quality curve
    tracks per k (plus cluster sizes, the companion balance check). Pure
    BIGINT: each dist_sq is the exact integer L2 the assignment already
    computed, so the inertia is one hash aggregate over the assignment
    table — no extra scan of the vectors. [extension]"""
    return (
        kmeans_exact_assignments(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("dist_sq").alias("inertia"),
        )
    )


QUERIES["kmeans_inertia"] = kmeans_inertia

ORACLE["kmeans_inertia"] = f"""
SELECT cluster_id, count(*) AS n_vecs,
       CAST(sum(dist_sq) AS BIGINT) AS inertia
FROM ({ORACLE["kmeans_exact_assignments"]})
GROUP BY cluster_id
"""
