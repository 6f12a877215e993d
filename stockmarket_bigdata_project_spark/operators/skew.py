"""Skew-handling join strategies (100 TB survival kit).

The reference's data is heavily skewed by construction — GME post volume
dwarfs NOK (reference README.md:440-444) — but its 2-core cluster never
surfaces it. At 1000 executors a skewed join key pins one task at 100× the
median and stalls the stage. Two mitigations ship here:

  * AQE skew-join splitting (session default, session.py) — handles skew
    detected at runtime from shuffle statistics.
  * explicit salting (this module) — for the pathological keys you know in
    advance, or when the skewed side feeds a non-AQE-splittable plan shape.

`salted_join_enrich` is semantically identical to the unsalted equi-join the
oracle declares; the salt only changes the partitioning: the skewed fact side
gets a uniform random-free salt (hash of row identity % N_SALT — deterministic,
no rand()), the dimension side is exploded N_SALT ways so every salted key
still finds its match. Cost: dimension replicated N_SALT×; benefit: the hot
key's rows spread over N_SALT reducers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

N_SALT = 8


def salted_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders on l_orderkey=o_orderkey with an N_SALT-way salt.

    Result is identical to the plain join (oracle proves it); the plan
    shuffles on (key, salt) instead of key, so a hot orderkey fans out over
    N_SALT partitions. Deterministic salt = hash of the fact row identity."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    fact = li.withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(N_SALT))
    )
    dim = o.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)]))
    )
    return (
        fact.join(
            dim,
            (fact.l_orderkey == dim.o_orderkey) & (fact.salt == dim.salt),
            "inner",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
        )
    )


def skewed_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diagnostic that decides WHETHER to salt: per-key row counts with
    their share of the table — run this before picking a strategy."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    total = F.sum("n_rows").over(Window.partitionBy())  # tiny post-agg frame
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / total, 6))
        .orderBy(F.desc("n_rows"))
    )


QUERIES = {
    "salted_join_enrich": salted_join_enrich,
    "skewed_key_histogram": skewed_key_histogram,
}

ORACLE = {
    # the salt must be invisible in the result: plain equi-join SQL
    "salted_join_enrich": """
SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
       CAST(o.o_orderdate AS DATE) AS order_date, o.o_totalprice
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
    "skewed_key_histogram": """
SELECT event_type, count(*) AS n_rows,
       round(count(*) * 1.0 / (SELECT count(*) FROM events), 6) AS share
FROM events GROUP BY event_type ORDER BY n_rows DESC
""",
}
