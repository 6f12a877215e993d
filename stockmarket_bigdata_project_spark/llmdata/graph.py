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
