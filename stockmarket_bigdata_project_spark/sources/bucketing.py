"""Bucketed tables: co-located joins with zero exchange (100 TB lever #1).

The single biggest shuffle eliminator for a recurring big-big join is
bucketing both sides on the join key: `bucketBy(N, key).sortBy(key)` at
write time pre-shuffles the data ONCE; every later join on that key runs
with NO Exchange on either side (SortMergeJoin directly over bucketed
scans). At 100 TB this turns the nightly fact⋈fact join from the dominant
cost into a map-side merge.

`bucketed_join_orders_lineitem` writes both tables bucketed on the order
key into a session warehouse, joins them, and returns the aggregate. The
companion test asserts the plan property that matters: no Exchange above
either bucketed scan. The oracle asserts the result is identical to the
plain join — bucketing must be invisible in the values.
"""

from __future__ import annotations

import os
import threading

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

N_BUCKETS = 8
_lock = threading.Lock()
_prepared: dict[str, bool] = {}


def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders/lineitem bucketed on the order key (once per sf_dir)."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    ot, lt = f"orders_b_{tag}", f"lineitem_b_{tag}"
    with _lock:
        if not _prepared.get(sf_dir):
            # a previous process may have left the managed location behind
            # with no catalog entry → LOCATION_ALREADY_EXISTS on saveAsTable
            import shutil
            from urllib.parse import urlparse

            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
            for t in (ot, lt):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
                if wh:
                    shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderdate", "o_totalprice"
            ).write.mode("overwrite").bucketBy(N_BUCKETS, "o_orderkey").sortBy(
                "o_orderkey"
            ).saveAsTable(ot)
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_quantity"
            ).write.mode("overwrite").bucketBy(N_BUCKETS, "l_orderkey").sortBy(
                "l_orderkey"
            ).saveAsTable(lt)
            _prepared[sf_dir] = True
    return ot, lt


def bucketed_join_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big join over co-bucketed tables: per-order revenue vs order
    total. Both scans are bucketed on the key → no Exchange (asserted in
    tests/test_bucketing.py)."""
    ot, lt = _ensure_bucketed_tables(spark, sf_dir)
    # merge hint: at toy SF the dimension fits a broadcast, which would hide
    # the property this query demonstrates; at 100 TB SMJ is the natural pick
    o = spark.table(ot).hint("merge")
    li = spark.table(lt)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(27,2)"
                )
            ).cast("double").alias(
                "line_revenue"
            ),
            F.count("*").alias("n_lines"),
        )
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
            "line_revenue",
            "n_lines",
        )
    )


QUERIES = {
    "bucketed_join_orders_lineitem": bucketed_join_orders_lineitem,
}

ORACLE = {
    # bucketing must not change the answer: plain join + agg
    "bucketed_join_orders_lineitem": """
SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_totalprice,
       CAST(sum(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS line_revenue,
       count(*) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3
""",
}
