"""Iterative k-means contracts: monotone cost, full coverage, determinism."""

from __future__ import annotations

from stockmarket_bigdata_project_spark.llmdata.clustering import (
    K,
    kmeans_cluster_sizes,
    kmeans_fit,
)


def test_kmeans_cost_monotone_nonincreasing(spark, sf_dir):
    _, costs = kmeans_fit(spark, sf_dir)
    assert all(b <= a * (1 + 1e-9) for a, b in zip(costs, costs[1:])), costs


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    from stockmarket_bigdata_project_spark.catalog import load_table

    sizes = kmeans_cluster_sizes(spark, sf_dir)
    total = load_table(spark, sf_dir, "embeddings").count()
    rows = sizes.collect()
    assert sum(r.n_members for r in rows) == total
    assert len(rows) <= K
