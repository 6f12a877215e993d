"""Batch relational core: projections, filters, dedup, explode, set ops, sorts.

Covers SURVEY §2.2 (P1-P12), §2.6 (O1-O4), §2.7 (set ops). Each operator is a
named query checked against the DuckDB oracle. All expressions are built-in
Catalyst expressions (whole-stage codegen; no Python UDFs), so filters and
projections push down to the parquet scans.

Reference parity cites (into /root/reference):
  P1  select/alias          spark_consumer.py:116-125
  P2  selectExpr            test_spark.py:19
  P3  withColumn derived    spark_consumer.py:100-101
  P4  isNotNull filter      reddit_pipeline.py:101
  P6  dropna                spark_consumer.py:82
  P7  fillna/coalesce       build_training_dataset.py:63, reddit_pipeline.py:140-141
  P8  dropDuplicates        spark_consumer.py:83
  P9  equality filter       stock_pipeline.py:288
  P10 range filter          split_data.py:69
  P11 explode               spark_consumer.py:104, reddit_pipeline.py:163
  P12 threshold split       split_data.py:77-84
  O1  multi-col sort        build_training_dataset.py:64
  O2  sort desc + limit     mongo.py:13-18 (TakeOrderedAndProject in Spark)
  O3  top/bottom-k          app.py:420-435
  J7  union-as-concat       download_finance_stooq.py:81
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table


# --- P1: projection + rename -------------------------------------------------
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )


# --- P2: SQL-expression projection ------------------------------------------
def select_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").selectExpr(
        "CAST(o_orderkey AS STRING) AS okey_str",
        "ROUND(o_totalprice * 0.1, 4) AS fee",
        "o_orderpriority AS priority",
    )


# --- P3: derived columns -----------------------------------------------------
def derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.to_date("ts").alias("event_date"),
        F.hour("ts").alias("event_hour"),
        F.round(F.col("value") * 2.0, 2).alias("value_x2"),
    )


# --- P4 + P6: null-predicate filter and dropna -------------------------------
def filter_notnull_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # synthesize nulls (testdata is clean), then exercise both null paths
    with_nulls = ev.withColumn(
        "score", F.when(F.col("value") < 20.0, None).otherwise(F.col("value"))
    )
    return (
        with_nulls.filter(F.col("ts").isNotNull())
        .na.drop(subset=["score"])
        .select("event_id", "user_id", "score")
    )


# --- P7: null-fill / coalesce ------------------------------------------------
def fillna_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    with_nulls = ev.withColumn(
        "score", F.when(F.col("value") < 20.0, None).otherwise(F.col("value"))
    )
    return with_nulls.select(
        "event_id",
        F.coalesce(F.col("score"), F.lit(0.0)).alias("score_filled"),
        F.when(F.col("score").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("was_null"),
    )


# --- P8: deterministic dedup-by-key -----------------------------------------
def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates(subset) made deterministic: keep min event_id per key.

    The reference's dropDuplicates(["ticker","date"]) (spark_consumer.py:83)
    keeps an arbitrary row; the engine pins the survivor so results are stable
    across partitionings and match the oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# --- P9 + P10: equality and range filters -----------------------------------
def filter_eq_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & F.col("l_shipdate").between("1996-01-01", "1996-12-31")
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")


# --- P11: explode (lateral) --------------------------------------------------
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per token — the reference's only table-generating op
    (explode of extracted tickers, reddit_pipeline.py:163)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.length("token") >= 5)
        .groupBy("token")
        .agg(F.count("*").alias("n"), F.count_distinct("doc_id").alias("n_docs"))
    )


# --- P12: threshold/boolean split -------------------------------------------
def threshold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/sim date-cutoff split (split_data.py:77-84) — returns the split
    sizes per side so both filters are exercised in one query."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "split",
            F.when(F.col("o_orderdate") < "1998-01-01", "train").otherwise("sim"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double").alias("total_price"),
        )
    )


# --- O1/O2/O3: sorts and top-k ----------------------------------------------
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy desc + limit → Catalyst TakeOrderedAndProject (no full sort at
    scale: per-partition top-k then merge). Tie-break on key for determinism."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


def bottomk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
        .limit(5)
        .select("o_orderkey", "o_totalprice")
    )


# --- set ops -----------------------------------------------------------------
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 union-as-concat with schema alignment by name (unionByName)."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_orderkey").alias("key"), F.lit("high").alias("bucket")
    )
    lo = o.filter(F.col("o_totalprice") < 50000).select(
        F.lit("low").alias("bucket"), F.col("o_orderkey").alias("key")
    )
    return hi.unionByName(lo).groupBy("bucket").agg(F.count("*").alias("n"))


def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.select(F.col("o_custkey").alias("key"))
        .intersect(c.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("key")))
    )


def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that never ordered (EXCEPT / anti-join shape)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(F.col("c_custkey").alias("key"))
        .exceptAll(o.select(F.col("o_custkey").alias("key")))
        .distinct()
    )


QUERIES = {
    "project_rename": project_rename,
    "select_expr": select_expr,
    "derived_columns": derived_columns,
    "filter_notnull_dropna": filter_notnull_dropna,
    "fillna_coalesce": fillna_coalesce,
    "dedup_by_key": dedup_by_key,
    "filter_eq_range": filter_eq_range,
    "explode_tokens": explode_tokens,
    "threshold_split": threshold_split,
    "topk_orders": topk_orders,
    "bottomk_orders": bottomk_orders,
    "union_by_name": union_by_name,
    "intersect_keys": intersect_keys,
    "except_keys": except_keys,
}

ORACLE = {
    "project_rename": """
SELECT c_custkey AS cust_id, c_name AS cust_name, c_mktsegment AS segment
FROM customer
""",
    "select_expr": """
SELECT CAST(o_orderkey AS VARCHAR) AS okey_str,
       ROUND(o_totalprice * 0.1, 4) AS fee,
       o_orderpriority AS priority
FROM orders
""",
    "derived_columns": """
SELECT event_id, user_id, CAST(ts AS DATE) AS event_date,
       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS event_hour,
       ROUND(value * 2.0, 2) AS value_x2
FROM events
""",
    "filter_notnull_dropna": """
WITH t AS (
  SELECT event_id, user_id, ts,
         CASE WHEN value < 20.0 THEN NULL ELSE value END AS score
  FROM events
)
SELECT event_id, user_id, score FROM t
WHERE ts IS NOT NULL AND score IS NOT NULL
""",
    "fillna_coalesce": """
WITH t AS (
  SELECT event_id, CASE WHEN value < 20.0 THEN NULL ELSE value END AS score
  FROM events
)
SELECT event_id, coalesce(score, 0.0) AS score_filled,
       CASE WHEN score IS NULL THEN 1 ELSE 0 END AS was_null
FROM t
""",
    "dedup_by_key": """
WITH t AS (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
  FROM events
)
SELECT user_id, event_type, event_id, value FROM t WHERE rn = 1
""",
    "filter_eq_range": """
SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
FROM lineitem
WHERE l_returnflag = 'R'
  AND l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'
""",
    "explode_tokens": """
SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
WHERE length(token) >= 5
GROUP BY token
""",
    "threshold_split": """
SELECT CASE WHEN o_orderdate < '1998-01-01' THEN 'train' ELSE 'sim' END AS split,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY 1
""",
    "topk_orders": """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
    "bottomk_orders": """
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 5
""",
    "union_by_name": """
WITH u AS (
  SELECT o_orderkey AS key, 'high' AS bucket FROM orders WHERE o_totalprice > 200000
  UNION ALL
  SELECT o_orderkey AS key, 'low' AS bucket FROM orders WHERE o_totalprice < 50000
)
SELECT bucket, count(*) AS n FROM u GROUP BY bucket
""",
    "intersect_keys": """
SELECT o_custkey AS key FROM orders
INTERSECT
SELECT c_custkey AS key FROM customer WHERE c_acctbal > 0
""",
    "except_keys": """
SELECT DISTINCT key FROM (
  SELECT c_custkey AS key FROM customer
  EXCEPT ALL
  SELECT o_custkey AS key FROM orders
)
""",
}
