"""Decision-support join/aggregate shapes (TPC-H Q6/Q7/Q10/Q14/Q15/Q18/Q19
analogs over the testdata schema) — [extension].

The reference's widest analytical read is a two-table join feeding a
groupBy (build_training_dataset.py:21-48); a warehouse-scale engine gets
asked the classic decision-support shapes, so each canonical plan shape is
pinned here once, adapted to the columns the testdata actually has (no
partsupp/shipmode/container):

  * discount_revenue_q6 — pure scan-side query: every predicate reaches the
    parquet scan (PushedFilters), one partial-agg, no shuffle of data rows.
  * nation_trade_balance_q7 — two independent dimension paths to the same
    fact (supplier nation vs customer nation), 625-group cross-classify.
  * returned_item_losses_q10 — selective fact filter → 3-way join → top-k
    by revenue (TakeOrderedAndProject, never a global sort).
  * promo_revenue_share_q14 — conditional-vs-total aggregation ratio on a
    broadcast part join.
  * top_revenue_suppliers_q15 — scalar-max decorrelation: the max revenue is
    a 1-row broadcast joined back against per-supplier revenue.
  * big_quantity_orders_q18 — HAVING-filtered keys semi-joined back to the
    fact: the qualifying-key set is small → broadcast, the fact table never
    shuffles.
  * brand_size_or_revenue_q19 — OR-of-ANDs predicate: Catalyst extracts the
    common `p_brand IN (...)` / quantity envelope as a pushable filter, the
    residual disjunction evaluates map-side after the broadcast join.

All revenue math follows the determinism playbook (COVERAGE.md): 4-decimal
DECIMAL(27,4) sums for price×(1±discount) terms, integer-valued doubles
summed raw, rankings tie-broken on keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

_REV_DEC = "decimal(27,4)"
_REV_SQL = "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE)"


def _revenue() -> F.Column:
    return (
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_REV_DEC))
        .cast("double")
        .alias("revenue")
    )


def discount_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: forecast-revenue-change — all three predicates push into the
    scan; the plan is scan → partial sum → final sum, zero row shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_REV_DEC))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def nation_trade_balance_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: revenue flow supplier-nation → customer-nation per ship year.
    The fact reaches each dimension by a different key path; nation is
    broadcast twice (two roles, two aliases). Cross-nation filter keeps the
    output at n·(n-1)·years groups."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_n = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(_revenue())
    )


def returned_item_losses_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by revenue lost to returns in one quarter.
    Both fact filters (returnflag, date window) are scan-side; the limit
    executes as TakeOrderedAndProject over the 1.5k-customer aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_revenue())
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def promo_revenue_share_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue as % of total for one month. Part is broadcast;
    both the conditional and total sums are exact decimals, so the final
    ratio is one identical binary64 division in either engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_REV_DEC)
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(_REV_DEC))).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_share_pct"),
        F.count("*").alias("n_items"),
    )


def top_revenue_suppliers_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) achieving the maximum quarterly revenue. The scalar
    max is a 1-row aggregate broadcast back over the per-supplier revenue —
    the decorrelated form of `WHERE total = (SELECT max(...))`. Equality on
    doubles is safe here because both sides come from the same exact
    decimal sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    per_supp = li.groupBy("l_suppkey").agg(_revenue())
    max_rev = per_supp.agg(F.max("revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(max_rev), F.col("revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "revenue")
    )


def big_quantity_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: large-volume orders — keys from a HAVING-filtered aggregate
    semi-joined back. The qualifying-key set is tiny relative to the fact
    (AQE broadcasts it); quantities are integer-valued doubles, exact under
    plain sum."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def brand_size_or_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-ANDs across join sides. Catalyst pushes the extractable
    conjuncts (brand IN-list, quantity envelope) into the scans and leaves
    the residual disjunction as a map-side post-join filter — the shape that
    separates engines with CNF extraction from those that give up on ORs."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(clause).agg(_revenue(), F.count("*").alias("n_items"))


QUERIES = {
    "discount_revenue_q6": discount_revenue_q6,
    "nation_trade_balance_q7": nation_trade_balance_q7,
    "returned_item_losses_q10": returned_item_losses_q10,
    "promo_revenue_share_q14": promo_revenue_share_q14,
    "top_revenue_suppliers_q15": top_revenue_suppliers_q15,
    "big_quantity_orders_q18": big_quantity_orders_q18,
    "brand_size_or_revenue_q19": brand_size_or_revenue_q19,
}

ORACLE = {
    "discount_revenue_q6": """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    "nation_trade_balance_q7": f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS ship_year,
       {_REV_SQL} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
""",
    "returned_item_losses_q10": f"""
SELECT c_custkey, c_name, n_name, c_acctbal, {_REV_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    "promo_revenue_share_q14": """
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))
                 ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE)
         AS promo_share_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
""",
    "top_revenue_suppliers_q15": f"""
WITH per_supp AS (
  SELECT l_suppkey, {_REV_SQL} AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue = (SELECT max(revenue) FROM per_supp)
""",
    "big_quantity_orders_q18": """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    "brand_size_or_revenue_q19": f"""
SELECT {_REV_SQL} AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)
""",
}
