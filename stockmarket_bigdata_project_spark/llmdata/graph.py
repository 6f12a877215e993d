"""Graph analytics over the near-duplicate document graph (north-star
extension, BASELINE.json): fixed-point integer PageRank.

Why PageRank on a dedup graph: after LSH finds verified near-dup PAIRS
(dedup.minhash_lsh_pairs) and connected components resolve CLUSTERS
(dedup.minhash_dup_components), a curation team still has to pick which
copy to keep and how to weight survivors. Duplication centrality — a doc
heavily connected inside a dup cluster is the "canonical" mirror; a leaf is
a one-off scrape — is exactly PageRank over the pair graph (cf. Page et
al. 1999; the same re-weighting idea appears in web-crawl curation
pipelines such as CommonCrawl ranking).

Exactness (the playbook problem with iterative float algorithms): float
PageRank is order-dependent (the per-node sum of neighbor contributions
accumulates in shuffle order), so it could only ever be a rows-only check.
This implementation runs the entire iteration in FIXED-POINT INTEGER
arithmetic — ranks are integers scaled by 10^12, contributions are integer
divisions (``rank div deg``), damping is ``(85 * s) div 100`` — so every
iterate is a sum of integers (order-independent) and the result is
bit-identical across engines and cluster layouts. The DuckDB oracle unrolls
the same ``PR_ITER`` iterations as chained CTEs; the one double in the
output is a single binary64 division by a constant.

Semantics: nodes = docs in ≥1 verified near-dup pair (every node therefore
has degree ≥ 1 — no dangling-mass term); edges are symmetric; ranks start
at ``PR_SCALE div n_nodes`` and iterate
``rank' = base + (85 * Σ_in (rank div deg)) div 100`` with
``base = (15 * (PR_SCALE div n_nodes)) div 100`` — floor-rounded
fixed-point of the standard damped update.

Design for 100 TB:
  * each iteration is one equi-join (ranks onto edge sources) + one
    sum-aggregation on the destination key — shuffle-linear in |edges|,
    the same shape as the connected-components loop (dedup.py:313);
  * the edge list is a byte-identical subplan joined on the same key in
    every iteration, so ReuseExchange materializes its shuffle once per
    action — the LSH pipeline that produces it never re-runs per iteration
    (at cluster scale, staging the edge list as a table is the same move);
  * only (doc_id, deg, rank) rows cross iterations — never documents;
  * iteration count is a small fixed constant (PR_ITER): dup-cluster
    diameters are shallow, and a fixed horizon keeps the computation — and
    its oracle — deterministic and bounded.

The reference has no graph layer at all; this extends the dedup
resolution path (SURVEY §2.10 north-star).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .dedup import _CC_CHAIN, minhash_lsh_pairs

PR_SCALE = 10**12  # fixed-point unit: total initial mass = PR_SCALE
PR_ITER = 3  # fixed iteration horizon (shallow dup clusters converge fast)


def pagerank_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, degree, rank_fp, pagerank) for every doc in ≥1 verified
    near-dup pair, after ``PR_ITER`` exact fixed-point iterations."""
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # symmetric edge list. NOT checkpointed: every iteration joins this
    # byte-identical subplan on the same key ("src"), so ReuseExchange
    # materializes its shuffle once per action — while localCheckpoint
    # (even eager=False) would force AQE to run the whole upstream LSH
    # pipeline at plan-BUILD time (toRdd materializes query stages).
    edges = pairs.union(pairs.select("doc_b", "doc_a")).toDF("src", "dst")
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    n_tbl = deg.agg(F.count("*").alias("n_nodes"))
    rank = deg.crossJoin(F.broadcast(n_tbl)).select(
        F.col("src").alias("doc_id"),
        "deg",
        F.expr(f"{PR_SCALE} div n_nodes").alias("rank"),
        F.expr(f"(15 * ({PR_SCALE} div n_nodes)) div 100").alias("base"),
    )
    for _ in range(PR_ITER):
        contrib = (
            rank.select(
                F.col("doc_id").alias("src"),
                F.expr("rank div deg").alias("share"),
            )
            .join(edges, "src")
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("share").alias("insum"))
        )
        # left join + coalesce: symmetric edges give every node an in-edge,
        # but the plan must not silently drop nodes if that ever changes
        rank = rank.join(contrib, "doc_id", "left").select(
            "doc_id",
            "deg",
            "base",
            (
                F.col("base") + F.expr("(85 * coalesce(insum, 0)) div 100")
            ).alias("rank"),
        )
    return rank.select(
        "doc_id",
        F.col("deg").alias("degree"),
        F.col("rank").alias("rank_fp"),
        (F.col("rank") / F.lit(1.0e12)).alias("pagerank"),
    )


QUERIES = {"pagerank_near_dup": pagerank_near_dup}


def _iter_sql(k: int) -> str:
    prev = f"r{k - 1}"
    return f"""r{k} AS MATERIALIZED (
  SELECT r.doc_id, r.deg, r.base,
         r.base + (85 * coalesce(s.insum, 0)) // 100 AS rank
  FROM {prev} r LEFT JOIN (
    SELECT e.dst AS doc_id, CAST(sum(p.rank // p.deg) AS BIGINT) AS insum
    FROM {prev} p JOIN pedges e ON e.src = p.doc_id GROUP BY e.dst
  ) s USING (doc_id)
)"""


_ITERS_SQL = ",\n".join(_iter_sql(k) for k in range(1, PR_ITER + 1))

# MATERIALIZED pins: DuckDB inlines plain CTEs per reference, so without it
# each unrolled iteration (and each r_k's two self-references) would re-run
# the entire shingle→minhash→LSH chain — measured 385 s → ~tens of s at sf0.1.
ORACLE = {
    "pagerank_near_dup": f"""{_CC_CHAIN},
pedges AS MATERIALIZED (SELECT src, dst FROM edges),
deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM pedges GROUP BY src),
ntbl AS (SELECT count(*) AS n_nodes FROM deg),
r0 AS MATERIALIZED (
  SELECT src AS doc_id, deg,
         {PR_SCALE} // n_nodes AS rank,
         (15 * ({PR_SCALE} // n_nodes)) // 100 AS base
  FROM deg, ntbl
),
{_ITERS_SQL}
SELECT doc_id, deg AS degree, rank AS rank_fp,
       rank / {float(PR_SCALE)} AS pagerank
FROM r{PR_ITER}
""",
}


def near_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    verified near-dup graph — the standard community-density signal (a
    near-dup CLUSTER has cc→1, a hub-and-spokes false-positive pattern has
    cc→0; curation uses it to pick between keep-one-per-component and
    manual review). Triangle enumeration is the classic ordered-edge
    3-way equi-join: each triangle {a<b<c} found exactly once via
    E(a,b)⋈E(b,c)⋈E(a,c) — shuffle-linear in edges for the sparse graphs
    near-dup detection produces, never an all-pairs product. The
    coefficient 2·t/(deg·(deg−1)) ships as round-half-up micros via the
    integer-rational quantizer. Like pagerank_near_dup, the LSH pair
    subplan is re-derived per join side (ReuseExchange folds what it can);
    at 100 TB the pair table would be staged once as parquet and all
    graph queries would read that. [extension]"""
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    p1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    p2 = pairs.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    p3 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = p1.join(p2, "b").join(p3, ["a", "c"])
    tcounts = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
    )
    edges = pairs.union(pairs.select("doc_b", "doc_a")).toDF("src", "dst")
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    return (
        deg.join(tcounts, deg.src == tcounts.doc_id, "left")
        .select(
            F.col("src").alias("doc_id"),
            F.col("deg").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
        .withColumn(
            "cc_micro",
            F.expr(
                "CASE WHEN degree >= 2 THEN"
                " (2 * (2 * n_triangles) * 1000000 + degree * (degree - 1))"
                " div (2 * degree * (degree - 1)) ELSE 0 END"
            ),
        )
    )


QUERIES["near_dup_triangles"] = near_dup_triangles

ORACLE["near_dup_triangles"] = f"""{_CC_CHAIN},
opairs AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM jpairs),
tri AS (
  SELECT p1.a, p1.b, p2.b AS c
  FROM opairs p1
  JOIN opairs p2 ON p2.a = p1.b
  JOIN opairs p3 ON p3.a = p1.a AND p3.b = p2.b
),
tcounts AS (
  SELECT v AS doc_id, count(*) AS n_triangles FROM (
    SELECT a AS v FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY v
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)
SELECT d.src AS doc_id, d.deg AS degree,
       coalesce(t.n_triangles, 0) AS n_triangles,
       CASE WHEN d.deg >= 2 THEN
         (2 * (2 * coalesce(t.n_triangles, 0)) * 1000000
          + d.deg * (d.deg - 1)) // (2 * d.deg * (d.deg - 1))
       ELSE 0 END AS cc_micro
FROM deg d LEFT JOIN tcounts t ON t.doc_id = d.src
"""
