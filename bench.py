"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop-format write (full execution of every
partition, no driver collect, no disk write) — the number is the end-to-end
plan execution time including the parquet scan, which is what a cluster run
would pay.
"""

from __future__ import annotations

import json
import os
import sys
import time

from stockmarket_bigdata_project_spark import registry
from stockmarket_bigdata_project_spark.session import get_spark

# One headline per engine layer (SURVEY §2 / §7.1 build order): medallion
# gold build, group-agg + join, interval join, window/time-series, top-k,
# text extraction, minhash dedup, embedding similarity.
HEADLINE = [
    "gold_daily_features",
    "revenue_by_brand",
    "local_supplier_volume",
    "join_daily_market_activity",
    "interval_join_48h",
    "asof_join_prev_order",
    "rolling_mean",
    "topk_per_group",
    "sequence_assembly",
    "extract_tickers_v2",
    "predict_returns",
    "minhash_lsh_pairs",
    "corpus_clean",
    "knn_bruteforce",
    "dedup_exact",
    "lang_id_scores",
    "media_catalog",
    "image_features",
]


def _force(df) -> None:
    """Execute the full plan without materializing to the driver or disk."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="stockmarket-bigdata-bench")

    queries = registry.all_queries()
    names = [n for n in HEADLINE if n in queries]

    # warm the JVM + parquet footer cache once so q1 doesn't pay session startup
    _force(queries[names[0]](spark, sf_dir).limit(1))

    timings: dict[str, float] = {}
    for name in names:
        start = time.perf_counter()
        _force(queries[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - start, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
