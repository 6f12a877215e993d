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


# Salt width for the hot-key rollup twin: the constructed hot key holds
# ~50% of the fact side, so a 16-way salt caps the hot reducer at ~1/16 of
# the hot cell — past the 5x skewedPartitionFactor AQE would split at.
HOT_SALT = 16


def _hot_keyed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a CONSTRUCTED skewed join key: every even user_id
    collapses to key 1 (~50% of rows), odd user_ids keep their own key —
    every key resolves to an existing c_custkey at every SF (user_id <
    |customer| always holds on the testdata). This is the GME-dwarfs-NOK
    distribution (reference README.md:440-444) made reproducible on the
    standard testdata, so the skew-handling strategies below are
    measurable at any blow-up scale instead of argued from the docs."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.when(F.col("user_id") % 2 == 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("k"),
        "event_id",
        "event_type",
    )


def hot_key_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type rollup through a deliberately skewed customer join:
    hot-keyed events ⋈ customer on k = c_custkey, then count + sum the
    joined nation key per event_type. The hot key 1 carries ~50% of the
    fact side into ONE join cell — the shape AQE skew-join splitting
    exists for (SURVEY §4.2 "Skew handling").

    This is the UNSALTED twin: both sides reach the SortMergeJoin through
    their OWN shuffle exchange, which is precisely the plan shape
    OptimizeSkewedJoin can split — the rule matches an SMJ whose children
    are direct shuffle reads, so it can re-read the dim partition once per
    hot-side chunk. (A dim derived by aggregating on the SAME key already
    satisfies the join's partitioning, leaves no dim-side shuffle to
    re-read, and AQE provably leaves the join unsplit — measured in
    tools_scale_study.py --skew-join; that shape is what the salted twin
    is for.) The trailing groupBy(event_type) re-shuffles anyway, so the
    split never forces an extra exchange. tools_scale_study.py --skew-join
    records the executed split (plan `skew=true`) and paired wall-times
    with the splitter on/off; tests/test_plans.py pins that the split
    triggers on this query. Integer outputs keep the oracle bit-exact.
    [extension]"""
    keyed = _hot_keyed_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    return (
        keyed.join(cust, keyed.k == cust.c_custkey, "inner")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("c_nationkey").alias("nation_weight"),
        )
        .orderBy("event_type")
    )


def hot_key_rollup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicitly salted twin of hot_key_rollup — same oracle result.

    For the pathological key you know in advance, or a plan shape AQE
    cannot split (e.g. the dim side is an aggregate on the join key, so
    there is no dim-side shuffle for the splitter to re-read — see
    hot_key_rollup's docstring), salt the fact side deterministically
    (hash of the row identity % HOT_SALT — no rand(), so the oracle
    holds) and explode the dim side HOT_SALT ways: the join key becomes
    (k, salt) and the hot cell's rows spread over HOT_SALT reducers, at
    the cost of replicating the dim HOT_SALT x. Prefer the AQE twin when
    the runtime can split; prefer this when it provably can't.
    [extension]"""
    keyed = _hot_keyed_events(spark, sf_dir)
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .withColumn(
            "salt",
            F.explode(F.array(*[F.lit(i) for i in range(HOT_SALT)])),
        )
    )
    fact = keyed.withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(HOT_SALT))
    )
    return (
        fact.join(
            cust,
            (fact.k == cust.c_custkey) & (fact.salt == cust.salt),
            "inner",
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("c_nationkey").alias("nation_weight"),
        )
        .orderBy("event_type")
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
    "hot_key_rollup": hot_key_rollup,
    "hot_key_rollup_salted": hot_key_rollup_salted,
}

# The constructed-skew rollup, as the salt-free SQL both twins must equal:
# the hot key (1, absorbing all even user_ids) carries ~50% of fact rows;
# outputs are integer counts and a sum of int nation keys, so the
# comparison is bit-exact.
_HOT_KEY_ROLLUP_SQL = """
WITH keyed AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN CAST(1 AS BIGINT)
              ELSE user_id END AS k,
         event_type
  FROM events
)
SELECT f.event_type,
       count(*) AS n_events,
       CAST(sum(c.c_nationkey) AS BIGINT) AS nation_weight
FROM keyed f JOIN customer c ON f.k = c.c_custkey
GROUP BY f.event_type
ORDER BY f.event_type
"""

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
    # the salt (and the AQE split) must be invisible in the result: both
    # twins share the identical salt-free SQL
    "hot_key_rollup": _HOT_KEY_ROLLUP_SQL,
    "hot_key_rollup_salted": _HOT_KEY_ROLLUP_SQL,
}
