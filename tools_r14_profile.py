"""Round-14 micro-profiler: time a list of queries (cold/steady, noop sink)
in one session, optionally decomposing the staged dedup pipeline into its
stages, so optimization work targets measured seconds and not guesses.

Usage:
    python tools_r14_profile.py q name1,name2[,...] [reps]
    python tools_r14_profile.py stages          # staged-pipeline decomposition

All timings use the noop sink (guide §1.4) and setJobDescription labels
(guide §1.5). Nothing here feeds the bench artifact — it is a workbench.
"""

from __future__ import annotations

import os
import sys
import time

from stockmarket_bigdata_project_spark import registry
from stockmarket_bigdata_project_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(label: str, spark, fn) -> float:
    spark.sparkContext.setJobDescription(label)
    start = time.perf_counter()
    fn()
    dt = time.perf_counter() - start
    spark.sparkContext.setJobDescription(None)
    print(f"  {label}: {dt:.3f}s", file=sys.stderr)
    return dt


def profile_queries(spark, sf_dir: str, names: list[str], reps: int) -> None:
    queries = registry.all_queries()
    from stockmarket_bigdata_project_spark.llmdata.dedup import clear_staged_memo

    for name in names:
        clear_staged_memo()
        _timed(f"{name} cold", spark, lambda: _force(queries[name](spark, sf_dir)))
        for i in range(reps):
            _timed(
                f"{name} steady{i + 1}",
                spark,
                lambda: _force(queries[name](spark, sf_dir)),
            )


def profile_stages(spark, sf_dir: str) -> None:
    """Decompose the minhash/corpus cold path stage by stage (each stage
    re-cleared so it pays its own full upstream cost — the deltas between
    successive rows isolate each stage's marginal cost)."""
    from stockmarket_bigdata_project_spark.llmdata import dedup
    from stockmarket_bigdata_project_spark.llmdata.corpus import corpus_clean
    from stockmarket_bigdata_project_spark.llmdata.dedup import clear_staged_memo

    clear_staged_memo()
    _timed("shingles (no distinct)", spark,
           lambda: _force(dedup._shingles_df(spark, sf_dir, distinct=False)))
    clear_staged_memo()
    _timed("minhash signatures", spark,
           lambda: _force(dedup._minhash_df(spark, sf_dir)))
    clear_staged_memo()
    _timed("lsh candidates", spark,
           lambda: _force(dedup._lsh_candidates(spark, sf_dir)))
    clear_staged_memo()
    _timed("candidate overlap", spark,
           lambda: _force(dedup._candidate_overlap(spark, sf_dir)))
    clear_staged_memo()
    _timed("minhash_lsh_pairs", spark,
           lambda: _force(dedup.minhash_lsh_pairs(spark, sf_dir)))
    clear_staged_memo()
    _timed("dup components (CC loop)", spark,
           lambda: _force(dedup.minhash_dup_components(spark, sf_dir)))
    clear_staged_memo()
    _timed("corpus_clean (full)", spark,
           lambda: _force(corpus_clean(spark, sf_dir)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r14-profile")
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    if mode == "q":
        names = [n for n in sys.argv[2].split(",") if n]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        profile_queries(spark, sf_dir, names, reps)
    else:
        profile_stages(spark, sf_dir)


if __name__ == "__main__":
    main()
