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
