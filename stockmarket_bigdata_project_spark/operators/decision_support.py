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
    part join (AQE-sized broadcast where part fits).
  * top_revenue_suppliers_q15 — scalar-max decorrelation: the max revenue is
    a 1-row broadcast joined back against per-supplier revenue.
  * big_quantity_orders_q18 — HAVING-filtered keys semi-joined back to the
    fact: the qualifying-key set is small → broadcast, the fact table never
    shuffles.
  * brand_size_or_revenue_q19 — OR-of-ANDs predicate: Catalyst extracts the
    common `p_brand IN (...)` / quantity envelope as a pushable filter, the
    residual disjunction evaluates map-side after the part join.
  * cheapest_supplier_q2 — correlated `= (SELECT min ...)` decorrelated to
    an argmin aggregate joined back on (key, exact-BIGINT cost); top-100 via
    TakeOrderedAndProject.
  * national_market_share_q8 — one nation's share of a region's market per
    year: conditional/total exact-decimal sums, one shared binary64 divide.
  * product_profit_q9 — profit = exact decimal revenue − integer-cents cost,
    grouped by (supplier nation, year).
  * priority_shipping_q12 — conditional two-way counts over a fact→orders
    join.
  * customer_distribution_q13 — two-level aggregate (orders per customer →
    histogram of counts) with a zero-keeping left join.
  * parts_supplier_counts_q16 — count(DISTINCT supplier) per attribute slice
    with a NOT-IN denylist executed as an anti join.
  * excess_share_suppliers_q20 — dominance threshold decorrelated to a
    part-level aggregate joined back; `2·supp_qty > part_qty` keeps the
    comparison in integers.
  * idle_rich_customers_q22 — uncorrelated scalar-avg subquery broadcast as
    a 1-row relation + anti join on recent orders.
  * important_parts_q11 — group-share-of-global-total threshold: the HAVING
    `> (SELECT frac * total)` scalar subquery decorrelates to a 1-row
    broadcast; the share compare stays in exact decimals (rev·n·2 >
    total·3, i.e. share > 1.5× the average share) so no engine divides.
  * blamed_suppliers_q21 — the double correlated EXISTS / NOT EXISTS
    decorrelated to per-order distinct-supplier aggregates joined back on
    the order key: `EXISTS other-supplier line` ⟺ order has ≥2 distinct
    suppliers, `NOT EXISTS other late supplier` ⟺ the order's late lines
    come from exactly 1 supplier. Two per-order aggregates replace two
    fact×fact semi/anti shuffles.

All revenue math follows the determinism playbook (COVERAGE.md): 4-decimal
DECIMAL(27,4) sums for price×(1±discount) terms, integer-valued doubles
summed raw, rankings tie-broken on keys.

Broadcast discipline (r10 verdict): forced `F.broadcast()` hints survive
only on relations bounded by CONSTRUCTION — the constant-size nation (25
rows) / region (5 rows) dims and 1-row scalar aggregates (max_rev, total,
avg_bal). customer/supplier/part scale linearly with SF (≈150k/10k/200k ×
SF — multi-billion-row at the 100 TB design point), so those joins run
UNHINTED: AQE picks the broadcast at every SF where they actually fit and
falls back to shuffle joins where they don't, instead of a forced OOM.
tests/test_broadcast_budget.py gates the rule over every registered query.
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
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
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
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_revenue())
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def promo_revenue_share_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue as % of total for one month. The part join is
    unhinted (AQE broadcasts it where part fits); both the conditional and
    total sums are exact decimals, so the final ratio is one identical
    binary64 division in either engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_REV_DEC)
    joined = li.join(p, li.l_partkey == p.p_partkey)
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
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
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
        .join(c, o.o_custkey == c.c_custkey)
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
    joined = li.join(p, li.l_partkey == p.p_partkey)
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


def cheapest_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog (schema has no partsupp, so the 'offer price' is the
    minimum observed unit cost per (part, supplier) from lineitem): for a
    part slice, every supplier matching the part's best unit cost, with the
    supplier's region pinned.

    The correlated `= (SELECT min(..) WHERE ps_partkey = p_partkey)`
    decorrelates into an argmin aggregate joined back on (partkey, cost).
    Unit cost is pure BIGINT arithmetic (cents·1000 DIV qty) so the
    equality join key is exact on any engine — never a float equality.
    Scale: both aggregates shuffle on l_partkey(+l_suppkey) only; the part
    and supplier joins are unhinted (AQE-sized); only the constant nation/
    region dims carry hints."""
    li = load_table(spark, sf_dir, "lineitem")
    uc = F.expr(
        "(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000)"
        " div CAST(l_quantity AS BIGINT)"
    )
    per_offer = (
        li.select("l_partkey", "l_suppkey", uc.alias("unit_cost_k"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_cost_k").alias("supply_cost_k"))
    )
    best = per_offer.groupBy("l_partkey").agg(
        F.min("supply_cost_k").alias("best_cost_k")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_brand")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # explicit aliases: best derives from per_offer, so unaliased column
    # references hit Spark's self-join lineage heuristic (it resolves them
    # positionally but warns "trivially true equals predicate")
    po = per_offer.alias("po")
    b = best.alias("b")
    return (
        po.join(
            b,
            (F.col("po.l_partkey") == F.col("b.l_partkey"))
            & (F.col("po.supply_cost_k") == F.col("b.best_cost_k")),
        )
        .select(
            F.col("po.l_partkey").alias("l_partkey"),
            F.col("po.l_suppkey").alias("l_suppkey"),
            F.col("po.supply_cost_k").alias("supply_cost_k"),
        )
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(eu_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "l_partkey", "p_brand", "supply_cost_k"
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("l_partkey"), F.asc("s_name")
        )
        .limit(100)
    )


def national_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's revenue share inside a region's market per order
    year. Conditional/total sums are both exact decimals from the same
    joined relation; the final share is one shared binary64 division.
    Fact side shuffles once (to the orders join); the dimension paths
    (customer→nation→region, supplier→nation, part) join unhinted — AQE
    broadcasts them where they fit; only nation/region carry hints."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    cust_in_region = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_REV_DEC)
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_in_region, o.o_custkey == F.col("c_custkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("order_year"),
            rev.alias("volume"),
            F.col("supp_nation"),
        )
    )
    zero = F.lit(0).cast(_REV_DEC)
    return base.groupBy("order_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share"),
        F.count("*").alias("n_items"),
    )


def product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit per (supplier nation, year) for a part slice. The cost
    term (no partsupp) is p_retailprice·quantity, carried as exact integer
    cents; revenue is the exact decimal sum; profit is one binary64
    subtraction of the two exact totals."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "LARGE"
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_REV_DEC)
    cost_c = F.expr(
        "CAST(round(p_retailprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
            rev.alias("rev_dec"),
            cost_c.alias("cost_c"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (
                F.sum("rev_dec").cast("double")
                - F.sum("cost_c").cast("double") / 100.0
            ).alias("sum_profit"),
            F.count("*").alias("n_items"),
        )
    )


def customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of customers by order count — the two-level
    aggregate (per-customer count, then histogram of counts) with the left
    join keeping zero-order customers. Pure integers end-to-end."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def parts_supplier_counts_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: distinct-supplier counts per part attribute slice, excluding a
    supplier denylist (NOT IN → broadcast anti join). The distinct count
    dedups map-side on (brand, type, size, suppkey) before the final
    count — no row-level shuffle of the join output."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def excess_share_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog: suppliers that dominate a part's shipments (their
    shipped quantity exceeds half the part's total) within a part-type
    slice. The correlated threshold decorrelates into a part-level
    aggregate joined back; the dominance test is 2·supp_qty > part_qty —
    INTEGER comparison, no float threshold. Quantities are integer-valued
    doubles: exact under plain sum."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "SMALL"
    ).select("p_partkey")
    slice_li = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("bigint").alias("qty")
    )
    per_supp = slice_li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("supp_qty")
    )
    per_part = slice_li.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    dominated = (
        per_supp.join(per_part, "l_partkey")
        .filter(2 * F.col("supp_qty") > F.col("part_qty"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        dominated.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominated_parts"), F.sum("supp_qty").alias("total_qty"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "n_dominated_parts", "total_qty")
    )


def idle_rich_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analog: per nation (a fixed nation subset), customers with
    above-average positive balance and no recent orders (anti join). The
    scalar average is an exact decimal sum ÷ count broadcast back — the
    uncorrelated scalar subquery decorrelation."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(27,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1999-01-01"
    ).select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(27,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


def priority_shipping_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analog (no shipmode column): per ship year, how many shipped
    lines belonged to critical-priority orders vs not — the conditional
    two-way count over a fact→orders join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def important_parts_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (no partsupp table — value = lineitem revenue): parts whose
    revenue share exceeds 1.5× the average part's share. The scalar
    `frac * sum(..)` HAVING subquery decorrelates to a 1-row broadcast of
    (total, n_parts); the threshold compare multiplies the exact decimal
    sums by integers (rev·n·2 > total·3) instead of dividing, so both
    engines compare the same exact rationals and the only double ever
    emitted is the final single cast. Reference parity:
    build_training_dataset.py:50-56 is the reference's only grouped-share
    idiom; this pins the warehouse form."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_REV_DEC)
        ).alias("rev_dec")
    )
    total = per_part.agg(
        F.sum("rev_dec").alias("total_dec"), F.count("*").alias("n_parts")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("rev_dec") * F.col("n_parts") * 2 > F.col("total_dec") * 3
        )
        .select(
            "l_partkey", F.col("rev_dec").cast("double").alias("part_revenue")
        )
    )


def blamed_suppliers_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (lateness = shipped >180 days after order date; no
    commit/receipt dates in the schema): suppliers who were the SOLE late
    shipper in finished multi-supplier orders, counted per supplier, top 20.

    Decorrelation: instead of the textbook correlated EXISTS (semi join
    lineitem×lineitem) + NOT EXISTS (anti join late×late) — two fact-to-fact
    shuffles whose probe side is the whole lineitem table — both predicates
    collapse into per-order aggregates: `n_supp = count(DISTINCT supp)` over
    the order's lines (≥2 ⟺ another supplier EXISTS) and `n_late_supp`
    over its late lines (=1 ⟺ NOT EXISTS another late supplier, since the
    candidate line itself is late). Everything joins on l_orderkey, so after
    one shuffle all three relations are co-partitioned; the supplier join is
    unhinted (AQE-sized); top-20 is TakeOrderedAndProject, never a global
    sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 180)
    )
    n_supp = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp")
    )
    n_late_supp = (
        late.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_late_supp"))
        .withColumnRenamed("l_orderkey", "late_orderkey")
    )
    return (
        late.join(n_supp.withColumnRenamed("l_orderkey", "ns_orderkey"),
                  F.col("l_orderkey") == F.col("ns_orderkey"))
        .join(n_late_supp, F.col("l_orderkey") == F.col("late_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


QUERIES = {
    "discount_revenue_q6": discount_revenue_q6,
    "nation_trade_balance_q7": nation_trade_balance_q7,
    "returned_item_losses_q10": returned_item_losses_q10,
    "promo_revenue_share_q14": promo_revenue_share_q14,
    "top_revenue_suppliers_q15": top_revenue_suppliers_q15,
    "big_quantity_orders_q18": big_quantity_orders_q18,
    "brand_size_or_revenue_q19": brand_size_or_revenue_q19,
    "cheapest_supplier_q2": cheapest_supplier_q2,
    "national_market_share_q8": national_market_share_q8,
    "product_profit_q9": product_profit_q9,
    "customer_distribution_q13": customer_distribution_q13,
    "parts_supplier_counts_q16": parts_supplier_counts_q16,
    "excess_share_suppliers_q20": excess_share_suppliers_q20,
    "idle_rich_customers_q22": idle_rich_customers_q22,
    "priority_shipping_q12": priority_shipping_q12,
    "important_parts_q11": important_parts_q11,
    "blamed_suppliers_q21": blamed_suppliers_q21,
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
    "cheapest_supplier_q2": """
WITH per_offer AS (
  SELECT l_partkey, l_suppkey,
         min((CAST(round(l_extendedprice * 100) AS BIGINT) * 1000)
             // CAST(l_quantity AS BIGINT)) AS supply_cost_k
  FROM lineitem GROUP BY 1, 2
), best AS (
  SELECT l_partkey, min(supply_cost_k) AS best_cost_k
  FROM per_offer GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, po.l_partkey, p_brand, supply_cost_k
FROM per_offer po
JOIN best b ON po.l_partkey = b.l_partkey AND po.supply_cost_k = b.best_cost_k
JOIN part ON po.l_partkey = p_partkey
JOIN supplier ON po.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
ORDER BY s_acctbal DESC, n_name, po.l_partkey, s_name
LIMIT 100
""",
    "national_market_share_q8": """
SELECT year(o_orderdate) AS order_year,
       CAST(sum(CASE WHEN sn.n_name = 'NATION_1'
                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))
                ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE)
         AS mkt_share,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""",
    "product_profit_q9": """
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE)
         - CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_profit,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'LARGE'
GROUP BY 1, 2
""",
    "customer_distribution_q13": """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
""",
    "parts_supplier_counts_q16": """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
    "excess_share_suppliers_q20": """
WITH slice AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL'
), per_supp AS (
  SELECT l_partkey, l_suppkey, sum(qty) AS supp_qty FROM slice GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey, sum(qty) AS part_qty FROM slice GROUP BY 1
), dominated AS (
  SELECT ps.l_suppkey, ps.supp_qty
  FROM per_supp ps JOIN per_part pp ON ps.l_partkey = pp.l_partkey
  WHERE 2 * ps.supp_qty > pp.part_qty
)
SELECT s_suppkey, s_name, count(*) AS n_dominated_parts,
       CAST(sum(supp_qty) AS BIGINT) AS total_qty
FROM dominated JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1, 2
""",
    "idle_rich_customers_q22": """
WITH cands AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
  WHERE c_nationkey IN (1, 3, 5, 7, 9)
), avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) / count(c_acctbal) AS avg_bal
  FROM cands WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS totacctbal
FROM cands, avg_bal
WHERE c_acctbal > avg_bal
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
""",
    "priority_shipping_q12": """
SELECT year(l_shipdate) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
""",
    "important_parts_q11": """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS rev_dec
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(rev_dec) AS total_dec, count(*) AS n_parts FROM per_part)
SELECT l_partkey, CAST(rev_dec AS DOUBLE) AS part_revenue
FROM per_part, tot
WHERE rev_dec * n_parts * 2 > total_dec * 3
""",
    "blamed_suppliers_q21": """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 180 DAY
), n_supp AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp FROM lineitem GROUP BY 1
), n_late AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_late_supp FROM late GROUP BY 1
)
SELECT s_name, count(*) AS numwait
FROM late
JOIN n_supp USING (l_orderkey)
JOIN n_late USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2 AND n_late_supp = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 20
""",
}
