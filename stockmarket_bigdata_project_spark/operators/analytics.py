"""Multi-table analytical join queries (TPC-H Q3/Q5 shapes) — [extension].

The reference never joins more than two tables at once (its widest plan is
the 2-key stream-static join, spark_consumer.py:111-115). A stock-market
engine run at warehouse scale gets asked star-shaped questions across the
whole schema, so the capability is pinned here with the two canonical
shapes:

  * shipping_priority (Q3): customer ⋈ orders ⋈ lineitem, filter both ends
    of the date range, top-k unshipped revenue — selective filters reach
    every scan, the join tree is left-deep over the two big tables, and the
    final top-k is TakeOrderedAndProject (no global sort).
  * local_supplier_volume (Q5): 6-table star — region/nation broadcast
    (tiny), customer/supplier equi-joins constrained to the same nation,
    revenue aggregated per nation. Catalyst's join reordering + AQE pick
    broadcast for every dimension; the lineitem fact never shuffles more
    than once.

Revenue sums use the DECIMAL(27,4) quantization of the determinism playbook
(COVERAGE.md): l_extendedprice*(1-l_discount) is 4-decimal by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table

_REV_DEC = "decimal(27,4)"
_REV_SQL = "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE)"


def _revenue() -> F.Column:
    return (
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_REV_DEC))
        .cast("double")
        .alias("revenue")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: top-10 unshipped orders by revenue for one market segment."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue())
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue from local-supplier orders per nation of one region,
    one order-year. Dimension chain region→nation broadcasts; customer and
    supplier must share the nation (the classic cross-dimension constraint)."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(dims), s.s_nationkey == dims.n_nationkey)
        .groupBy("n_name")
        .agg(_revenue())
    )


# --- subquery shapes (Catalyst decorrelation) --------------------------------
# The reference has no subqueries at all (its only nested lookup is the
# per-row Mongo find in stock_pipeline.py:155-179, which J5 replaced with a
# set-based join). These four pin the classic decorrelated forms a warehouse
# user writes daily — EXISTS → left-semi, correlated scalar agg → join with
# a grouped subplan, HAVING-IN → semi over an aggregate, NOT-EXISTS +
# uncorrelated scalar → anti join + broadcast threshold. In every case the
# DataFrame side states the decorrelated plan directly (what Catalyst would
# rewrite to), so there is no hidden per-row re-execution at scale.


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: per-priority count of Q1-1996 orders where EXISTS a lineitem
    shipped more than 30 days after the order date. Semi-join keeps the
    orders scan as the only row producer — no duplicate counting however
    many lineitems are late."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 30)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: yearly revenue lost to small orders of one brand —
    lineitems with quantity below 20% of that part's average quantity.

    The correlated scalar subquery (per-part avg over ALL of lineitem)
    becomes a partition window over the brand-filtered join: filtering by
    p_partkey first is semantics-preserving because the correlation key IS
    the filter key, so the 100 TB lineitem is scanned once, reduced by the
    brand-sliced part dimension (unhinted — the slice is ∝ SF, so AQE sizes
    the broadcast at runtime), and never grouped globally. Quantities are
    integer-valued doubles — exact under any sum order."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    avg_qty = F.sum("l_quantity").over(w) / F.count("l_quantity").over(w)
    return (
        j.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds 300, with the customer
    attached. The HAVING-IN subquery decorrelates to an aggregate + inner
    join back to orders; the big side aggregates BEFORE joining (46 rows out
    of 60k orders at sf0.01). The survivor set is UNHINTED (found by the
    r10 broadcast-budget lint): it is a threshold-filtered FACT aggregate —
    selective on TPC-H data but ∝ |orders| structurally — so the hint is
    left to AQE, which broadcasts it at runtime exactly when it is as tiny
    as Q18 selectivity makes it."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


def rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per-segment count and balance mass of customers with
    above-average positive balance and NO orders in June 1996 (the synthetic
    orders table keeps nearly every customer active overall, so the window
    makes the anti-join discriminating). The uncorrelated scalar subquery
    (global avg) is a 1-row broadcast; NOT EXISTS is a left-anti join —
    neither touches the fact table twice. Balance sums go through
    DECIMAL(27,2) (money is 2-dec by construction) so both engines emit the
    same double."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-06-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(27,2)")).cast("double")
                / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(27,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


def order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: percent_rank / cume_dist of each order's price
    within its priority class. Both are rank-ratio rationals of integers —
    ties collapse to the same value in every engine, so the output is
    hash-exact without any rounding. [extension]"""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


# --- null-safe equality join (<=>) -------------------------------------------
def null_safe_join_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compare the event mix of the two halves of the user population with a
    NULL-SAFE equi-join (`eqNullSafe` / SQL `<=>`): the join key is
    NULLIF(event_type, 'error') so the NULL bucket is real, and a plain `=`
    join would silently drop it — the classic silent-data-loss bug this
    operator exists to prevent. Executes as a normal hash join (null-safe
    equality is still an equi-key for partitioning). [extension]"""
    ev = load_table(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error"))
    halves = [
        ev.filter((F.col("user_id") % 2) == i)
        .groupBy(k.alias("kind"))
        .agg(F.count("*").alias(f"n_{side}"))
        for i, side in ((0, "even"), (1, "odd"))
    ]
    a, b = halves
    return (
        a.join(b, a.kind.eqNullSafe(b.kind), "full")
        .select(
            # coalesce is for one-sided rows; the true NULL bucket has NULL
            # on BOTH sides (matched by <=>) and stays NULL
            F.coalesce(a.kind, b.kind).alias("kind"),
            "n_even",
            "n_odd",
            (F.col("n_even") - F.col("n_odd")).alias("diff"),
        )
    )


# --- recursive CTE -----------------------------------------------------------
def recursive_calendar_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free Q1-1996 daily order series from a RECURSIVE CTE calendar
    spine (WITH RECURSIVE ... UNION ALL, linear recursion, 90 steps) left
    joined to the orders fact — zero-order days survive with n_orders = 0.
    Recursion generates the 90-row spine on the driver side of the plan; the
    fact side stays one pruned scan + one aggregation, so the recursive
    construct adds no data-proportional cost. [extension]"""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH RECURSIVE cal(day) AS (
          SELECT DATE '1996-01-01'
          UNION ALL
          SELECT date_add(day, 1) FROM cal WHERE day < DATE '1996-03-30'
        )
        SELECT c.day,
               count(o_orderkey) AS n_orders,
               CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(27,2))), 0)
                    AS DOUBLE) AS day_value
        FROM cal c
        LEFT JOIN orders_v o ON CAST(o.o_orderdate AS DATE) = c.day
        GROUP BY c.day
        """
    )


# --- lateral join ------------------------------------------------------------
def lateral_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-3 orders by value via a correlated LATERAL derived
    table — the SQL-surface twin of the window-rank top-n idiom (ANSI
    LATERAL, same text runs on DuckDB/Postgres/Trino). Catalyst decorrelates
    the limit-per-group into a partitioned rank under the hood, so the plan
    is one co-partitioned join + window, never a per-customer re-scan of
    orders. Ties on o_totalprice break on o_orderkey inside the LATERAL
    ORDER BY, keeping the result deterministic. [extension]"""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_v c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_v o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) t
        """
    )


# --- ordered funnel ----------------------------------------------------------
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase): users counted at
    step k only if step k's FIRST qualifying event happens strictly after
    their step-(k−1) anchor — the event-analytics primitive behind every
    conversion dashboard. Decorrelated to per-user min-timestamp
    aggregates chained by equi-joins on user_id: each pass filters the fact
    by type first (pushed to the scan), aggregates map-side to one row per
    user, and joins user-sized relations — never fact×fact. [extension]"""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("users_viewed"))
        .crossJoin(c.agg(F.count("*").alias("users_clicked_after")))
        .crossJoin(p.agg(F.count("*").alias("users_purchased_after")))
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day (cohort),
    counted distinct per (cohort, day-offset) — the product-analytics
    primitive behind every retention curve. Decorrelated the same way as
    the funnel: one per-user min-day aggregate joined back to the fact by
    user_id, then a two-key distinct count. No fact×fact anywhere. The
    cohort relation is USER-sized — it grows with the fact table, so the
    join is UNHINTED (found by the r10 broadcast-budget lint, same class
    as the r9-verdict de-hints): AQE broadcasts it at runtime when the
    user universe is small, otherwise both sides shuffle on user_id.
    [extension]"""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row cross-table conformance report: orphaned lineitems (no
    parent order), childless orders (no lineitems), and dangling customer
    keys on orders — the dq_profile of the relational layer. Each check is
    an anti-join key count; the key sets aggregate to distinct keys first,
    so nothing fact-sized ever sits on a join's build side. [extension]"""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    li_keys = li.distinct()
    orphan_li = li_keys.join(
        o.select("o_orderkey"),
        li_keys["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    )
    childless_o = o.select("o_orderkey").join(
        li_keys, F.col("o_orderkey") == li_keys["l_orderkey"], "left_anti"
    )
    dangling_cust = o.select("o_custkey").distinct().join(
        c, F.col("o_custkey") == c["c_custkey"], "left_anti"
    )
    return (
        orphan_li.agg(F.count("*").alias("n_orphan_lineitem_keys"))
        .crossJoin(childless_o.agg(F.count("*").alias("n_childless_orders")))
        .crossJoin(
            dangling_cust.agg(F.count("*").alias("n_dangling_custkeys"))
        )
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event stream:
    (event_type → next event_type) frequencies plus the row-conditional
    probability — the sequence-analysis primitive behind 'what do users do
    next'. One per-user window pass (lag shuffle) feeding a tiny
    |types|² aggregate; the probability is one binary64 division of two
    exact counts, computed from a broadcast of the per-type totals.
    Ordering is total (ts, event_id) so ties can't flip transitions
    between engines. [extension]"""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        (F.col("n_transitions").cast("double") / F.col("n_from")).alias(
            "p_transition"
        ),
    )


QUERIES = {
    "shipping_priority": shipping_priority,
    "null_safe_join_event_mix": null_safe_join_event_mix,
    "recursive_calendar_fill": recursive_calendar_fill,
    "local_supplier_volume": local_supplier_volume,
    "late_shipment_priority": late_shipment_priority,
    "small_quantity_revenue": small_quantity_revenue,
    "large_volume_customers": large_volume_customers,
    "rich_inactive_customers": rich_inactive_customers,
    "order_value_distribution": order_value_distribution,
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
    "referential_integrity_audit": referential_integrity_audit,
    "event_transition_matrix": event_transition_matrix,
    "lateral_topn_orders": lateral_topn_orders,
}

ORACLE = {
    "lateral_topn_orders": """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) t
""",
    "shipping_priority": f"""
SELECT l_orderkey, o_orderdate, o_orderpriority, {_REV_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
    "local_supplier_volume": f"""
SELECT n_name, {_REV_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
""",
    "null_safe_join_event_mix": """
WITH halves AS (
  SELECT user_id % 2 AS side, nullif(event_type, 'error') AS kind, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT coalesce(a.kind, b.kind) AS kind, a.n AS n_even, b.n AS n_odd, a.n - b.n AS diff
FROM (SELECT kind, n FROM halves WHERE side = 0) a
FULL JOIN (SELECT kind, n FROM halves WHERE side = 1) b
  ON a.kind IS NOT DISTINCT FROM b.kind
""",
    "recursive_calendar_fill": """
WITH RECURSIVE cal(day) AS (
  SELECT DATE '1996-01-01'
  UNION ALL
  SELECT day + 1 FROM cal WHERE day < DATE '1996-03-30'
)
SELECT c.day,
       count(o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(27,2))), 0) AS DOUBLE) AS day_value
FROM cal c
LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = c.day
GROUP BY c.day
""",
    "late_shipment_priority": """
SELECT o_orderpriority, count(*) AS n_late_orders
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
""",
    "small_quantity_revenue": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * (sum(l_quantity) / count(l_quantity)) FROM lineitem l2
    WHERE l2.l_partkey = part.p_partkey
  )
""",
    "large_volume_customers": """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
""",
    "rich_inactive_customers": """
SELECT c_mktsegment,
       count(*) AS n_custs,
       CAST(sum(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) / count(c_acctbal)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= DATE '1996-06-01' AND o_orderdate < DATE '1996-07-01'
  )
GROUP BY c_mktsegment
""",
    "order_value_distribution": """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cum_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
""",
    "funnel_conversion": """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
  WHERE event_type = 'click' AND ts > t1 GROUP BY 1
), p AS (
  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1
)
SELECT (SELECT count(*) FROM v) AS users_viewed,
       (SELECT count(*) FROM c) AS users_clicked_after,
       (SELECT count(*) FROM p) AS users_purchased_after
""",
}

ORACLE["cohort_retention"] = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
SELECT cohort_day,
       CAST(datediff('day', cohort_day, day) AS INTEGER) AS day_offset,
       count(DISTINCT user_id) AS n_active_users
FROM ev JOIN first USING (user_id)
GROUP BY cohort_day, day_offset
"""

ORACLE["referential_integrity_audit"] = """
SELECT
  (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) lk
   WHERE lk.l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    AS n_orphan_lineitem_keys,
  (SELECT count(*) FROM orders o
   WHERE o.o_orderkey NOT IN (SELECT DISTINCT l_orderkey FROM lineitem))
    AS n_childless_orders,
  (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders) ok
   WHERE ok.o_custkey NOT IN (SELECT c_custkey FROM customer))
    AS n_dangling_custkeys
"""

ORACLE["event_transition_matrix"] = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n_transitions
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
), totals AS (
  SELECT from_type, sum(n_transitions) AS n_from FROM counts GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n_transitions,
       CAST(c.n_transitions AS DOUBLE) / t.n_from AS p_transition
FROM counts c JOIN totals t USING (from_type)
"""


def event_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence-pattern counting: per user, how many
    CONSECUTIVE view→click→purchase runs (and signup→error runs) occur in
    event-time order — the CEP/pattern-mining primitive SQL gained in
    MATCH_RECOGNIZE and Spark lacks natively. Each user's ordered event
    types collapse to a compact symbol string (first letters are unique
    across the 5 types) and patterns are counted with one regexp per row —
    the classic distributed form (symbolize → per-key fold → regex), since
    per-user sequences are bounded (the sequence_assembly/sessionize
    precedent) while the corpus of users is not. Total event-time order is
    pinned by (ts, event_id), so the string — and the counts — are
    deterministic on any cluster layout. [extension]"""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.col("ts"),
            F.col("event_id"),
            F.substring("event_type", 1, 1).alias("s"),
        ).alias("e"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list("e")).alias("es")
    )
    seq = F.array_join(F.transform("es", lambda e: e["s"]), "")
    return per_user.select(
        "user_id",
        F.length(seq).alias("n_events"),
        F.regexp_count(seq, F.lit("vcp")).alias("n_view_click_buy"),
        F.regexp_count(seq, F.lit("se")).alias("n_signup_error"),
    )


QUERIES["event_pattern_matches"] = event_pattern_matches

ORACLE["event_pattern_matches"] = """
WITH seqs AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS INTEGER) AS n_events,
       CAST(len(regexp_extract_all(seq, 'vcp')) AS INTEGER)
         AS n_view_click_buy,
       CAST(len(regexp_extract_all(seq, 'se')) AS INTEGER)
         AS n_signup_error
FROM seqs
"""


MIN_ITEM_SUPPORT = 3  # apriori prune: item kept iff it appears in ≥ N orders
MIN_PAIR_SUPPORT = 2  # pair reported iff it co-occurs in ≥ N orders


def frequent_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: pairs of parts bought together in the
    same order, with supports and an exact integer lift score. [extension]

    The classic frequent-itemset first rounds at warehouse scale:
    (1) collapse the fact table to distinct (basket, item) — linear;
    (2) APRIORI PRUNE: an item below MIN_ITEM_SUPPORT cannot appear in a
    frequent pair, so infrequent items are dropped BEFORE the pairing
    self-join (the A-priori downward-closure property — at 100 TB this is
    what keeps the candidate space bounded);
    (3) pair by equi-join on the basket key — both sides hash-partition on
    l_orderkey, so the pairing is co-located and the per-basket fanout is
    C(items_in_basket, 2), bounded (TPC-H baskets hold ≤ 7 items; a
    pathological mega-basket would get a per-basket item cap first).
    Never an all-pairs product across baskets.

    Lift is emitted as an exact scaled integer
    (pair_support · n_orders · 10⁶) div (support_a · support_b) — BIGINT
    floor-division is bit-identical across engines, where a double divide
    is not (determinism playbook, COVERAGE.md)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    support = li.groupBy("l_partkey").agg(F.count("*").alias("item_support"))
    basket = li.join(
        support.filter(F.col("item_support") >= MIN_ITEM_SUPPORT), "l_partkey"
    )
    a = basket.select(
        "l_orderkey",
        F.col("l_partkey").alias("part_a"),
        F.col("item_support").alias("support_a"),
    )
    b = basket.select(
        "l_orderkey",
        F.col("l_partkey").alias("part_b"),
        F.col("item_support").alias("support_b"),
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b", "support_a", "support_b")
        .agg(F.count("*").alias("pair_support"))
        .filter(F.col("pair_support") >= MIN_PAIR_SUPPORT)
    )
    tot = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    return pairs.join(F.broadcast(tot)).select(
        "part_a",
        "part_b",
        "pair_support",
        "support_a",
        "support_b",
        F.expr(
            "(pair_support * n_orders * 1000000L)"
            " div (support_a * support_b)"
        ).alias("lift_micros"),
    )


QUERIES["frequent_item_pairs"] = frequent_item_pairs

ORACLE["frequent_item_pairs"] = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sup AS (SELECT l_partkey, count(*) AS item_support FROM li GROUP BY 1),
basket AS (
  SELECT li.l_orderkey, li.l_partkey, s.item_support
  FROM li JOIN sup s USING (l_partkey)
  WHERE s.item_support >= {MIN_ITEM_SUPPORT}
),
pc AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         a.item_support AS support_a, b.item_support AS support_b,
         count(*) AS pair_support
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= {MIN_PAIR_SUPPORT}
),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li)
SELECT part_a, part_b, pair_support, support_a, support_b,
       (pair_support * n_orders * 1000000) // (support_a * support_b)
         AS lift_micros
FROM pc, tot
"""


def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) per market segment: orders not
    dominated on (earlier-or-equal day, higher-or-equal price, one
    strict) by any other order in the segment. [extension]

    Skyline via windows, not the naive NOT-EXISTS self-join: collapse to
    per-(segment, day) maxima first (linear agg), then a single running
    prev-day max over the day-level table decides frontier days, then one
    equi-join back tags the frontier rows. Dominance check cost is
    |segment-days|, not |orders|².

    The skyline operator is DISTRIBUTIVE — skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)) — so at 100 TB the same plan holds:
    partial per-partition frontiers shrink the day-level table before the
    per-segment window, and the window partitions by segment (parallel
    across segments, no global sort).

    All comparisons are on stored values (date, double max — no float
    arithmetic), so the output is bit-identical across engines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("day"),
        "o_totalprice",
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_mktsegment", "day", "o_totalprice")
    daymax = o.groupBy("c_mktsegment", "day").agg(
        F.max("o_totalprice").alias("day_max")
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky_days = daymax.withColumn(
        "prev_max", F.max("day_max").over(w)
    ).filter(F.col("prev_max").isNull() | (F.col("day_max") > F.col("prev_max")))
    return (
        o.join(sky_days, ["c_mktsegment", "day"])
        .filter(F.col("o_totalprice") == F.col("day_max"))
        .select(
            "o_orderkey",
            "c_mktsegment",
            "day",
            F.col("o_totalprice").alias("frontier_price"),
        )
    )


QUERIES["pareto_frontier_orders"] = pareto_frontier_orders

ORACLE["pareto_frontier_orders"] = """
WITH o AS (
  SELECT o_orderkey, c_mktsegment, CAST(o_orderdate AS DATE) AS day,
         o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
),
dm AS (
  SELECT c_mktsegment, day, max(o_totalprice) AS day_max
  FROM o GROUP BY 1, 2
),
sk AS (
  SELECT *, max(day_max) OVER (
    PARTITION BY c_mktsegment ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM dm
)
SELECT o.o_orderkey, o.c_mktsegment, o.day, o.o_totalprice AS frontier_price
FROM o JOIN sk ON o.c_mktsegment = sk.c_mktsegment AND o.day = sk.day
WHERE (sk.prev_max IS NULL OR sk.day_max > sk.prev_max)
  AND o.o_totalprice = sk.day_max
"""


def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules from the frequent-pair table: every
    surviving pair {A,B} emits A→B and B→A with exact integer confidence
    conf(A→B) = pair_support·10⁶ div support_A (and the symmetric lift
    already carried by the pair). The rule step costs nothing beyond
    frequent_item_pairs — a projection and a union of two column
    permutations of the SAME aggregated pair table (candidate generation,
    A-priori pruning and the basket self-join are inherited; see
    frequent_item_pairs for the 100 TB argument). [extension]"""
    p = frequent_item_pairs(spark, sf_dir)
    ab = p.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "pair_support",
        F.expr("(pair_support * 1000000L) div support_a").alias(
            "conf_micros"
        ),
        "lift_micros",
    )
    ba = p.select(
        F.col("part_b").alias("antecedent"),
        F.col("part_a").alias("consequent"),
        "pair_support",
        F.expr("(pair_support * 1000000L) div support_b").alias(
            "conf_micros"
        ),
        "lift_micros",
    )
    return ab.unionByName(ba)


QUERIES["association_rules"] = association_rules

ORACLE["association_rules"] = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sup AS (SELECT l_partkey, count(*) AS item_support FROM li GROUP BY 1),
basket AS (
  SELECT li.l_orderkey, li.l_partkey, s.item_support
  FROM li JOIN sup s USING (l_partkey)
  WHERE s.item_support >= {MIN_ITEM_SUPPORT}
),
pc AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         a.item_support AS support_a, b.item_support AS support_b,
         count(*) AS pair_support
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= {MIN_PAIR_SUPPORT}
),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
lifted AS (
  SELECT part_a, part_b, pair_support, support_a, support_b,
         (pair_support * n_orders * 1000000) // (support_a * support_b)
           AS lift_micros
  FROM pc, tot
)
SELECT part_a AS antecedent, part_b AS consequent, pair_support,
       (pair_support * 1000000) // support_a AS conf_micros, lift_micros
FROM lifted
UNION ALL
SELECT part_b AS antecedent, part_a AS consequent, pair_support,
       (pair_support * 1000000) // support_b AS conf_micros, lift_micros
FROM lifted
"""


def rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer the recency (days from
    last order to the corpus anchor = global max order date), frequency
    (order count) and monetary (exact total cents), each cut into exact
    ascending quintiles by the rank formula ((rn−1)·5) div n + 1 with
    o_custkey as the total-order tiebreak. The classic CRM scoring table.

    Scale note: the quintile windows run over the CUSTOMER-level
    aggregate (|customers|, three orders of magnitude below |orders|) —
    the same exact-global-ntile stance as lm_perplexity_buckets, whose
    docstring records the sampled-cutoff replacement (two map passes,
    broadcast cutoffs, zero global sort) that slots in at cluster scale;
    lm_ccnet_buckets_sampled is the shipped template. [extension]"""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("day"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    anchor = o.agg(F.max("day").alias("anchor"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("day").alias("last_day"),
            F.count("*").alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
        .join(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor", "last_day").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )

    def bucket(col: str) -> F.Column:
        w = Window.orderBy(F.col(col), F.col("o_custkey"))
        rn = F.row_number().over(w).cast("long")
        n = F.count("*").over(Window.partitionBy()).cast("long")
        # exact integer division: a is a positive long < 2^53, so the
        # (a - a%n)/n binary64 quotient is exact (the _idiv idiom)
        a = (rn - 1) * 5
        return ((a - F.pmod(a, n)) / n).cast("long") + 1

    return per_cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        bucket("recency_days").alias("r_bucket"),
        bucket("frequency").alias("f_bucket"),
        bucket("monetary_cents").alias("m_bucket"),
    )


QUERIES["rfm_scores"] = rfm_scores

ORACLE["rfm_scores"] = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
anchor AS (SELECT max(day) AS anchor FROM o),
per_cust AS (
  SELECT o_custkey,
         date_diff('day', max(day), (SELECT anchor FROM anchor))
           AS recency_days,
         count(*) AS frequency,
         CAST(sum(cents) AS BIGINT) AS monetary_cents
  FROM o GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary_cents,
       ((row_number() OVER (ORDER BY recency_days, o_custkey) - 1) * 5)
         // count(*) OVER () + 1 AS r_bucket,
       ((row_number() OVER (ORDER BY frequency, o_custkey) - 1) * 5)
         // count(*) OVER () + 1 AS f_bucket,
       ((row_number() OVER (ORDER BY monetary_cents, o_custkey) - 1) * 5)
         // count(*) OVER () + 1 AS m_bucket
FROM per_cust
"""


# --- Global two-phase skyline -------------------------------------------
def _pf_parts(spark: SparkSession) -> int:
    """Phase-1 pre-prune bucket count, derived from the session's
    parallelism (r11-verdict watch item: a fixed 32 meant |orders|/32
    rows per phase-1 sort task at any cluster size; ∝ defaultParallelism
    keeps per-task sort input bounded as executors scale). The bucket
    count affects only pruning granularity — every local frontier is a
    superset-filter of the global one — so the RESULT is invariant to
    this constant (pinned by test_skyline_bucket_count_invariance)."""
    return max(2 * spark.sparkContext.defaultParallelism, 8)


def skyline_two_phase_orders(
    spark: SparkSession, sf_dir: str, n_buckets: int | None = None
) -> DataFrame:
    """The skyline operator (Börzsönyi et al. 2001): orders not Pareto-
    dominated under (maximize o_totalprice, maximize o_orderdate) — "no
    other order is both at-least-as-expensive and at-least-as-recent,
    with one strictly better". Ties on both axes are all non-dominated
    (domination requires a strict edge), so the result set is
    deterministic with no arbitrary winner-picking.

    Neither engine ships a skyline operator; the 2-D case reduces to
    sorting one axis and running-max'ing the other: a row survives iff its
    date equals its price level's max date (RANGE CURRENT ROW peers) AND
    strictly exceeds the running max date over all strictly-higher price
    levels (RANGE UNBOUNDED PRECEDING → 1 PRECEDING under DESC order) —
    both frames share one sort, so each phase is a single Window node.
    The quadratic NOT-EXISTS form exists only as the independent semantic
    oracle in tests.

    Scale (the standard two-phase distributed skyline): phase 1 prunes
    each deterministic id-hash bucket to its LOCAL frontier partitioned
    by bucket — local domination implies global domination, so the prune
    is sound and shuffle-parallel; phase 2 runs the same window globally
    over the surviving sliver (frontiers of random partitions are tiny:
    expected O(log n) points each for independent dims). The one
    single-partition window therefore touches |survivors| ≈ buckets·log n
    rows, never the fact table — and there is NO broadcast or join
    anywhere in the plan (r10-verdict watch item: the former phase-2
    broadcast semi-join was only data-structurally bounded — adversarial
    anticorrelated data makes frontiers O(n), which for a broadcast means
    driver OOM; the window form degrades to a spilling single-partition
    sort of the sliver instead, and the broadcast-budget lint needs no
    skyline exception at all). Output: the frontier orders (key, cents,
    date) — pure BIGINT/DATE.  [extension]"""
    nb = n_buckets if n_buckets is not None else _pf_parts(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.to_date("o_orderdate").alias("odate"),
        (F.col("o_orderkey") % nb).alias("pb"),
    )

    def frontier(df: DataFrame, part_cols: list[str]) -> DataFrame:
        w_peer = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("cents").desc())
            .rangeBetween(Window.currentRow, Window.currentRow)
        )
        w_higher = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("cents").desc())
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        return (
            df.withColumn("dmax", F.max("odate").over(w_peer))
            .withColumn("runmax", F.max("odate").over(w_higher))
            .filter(
                (F.col("odate") == F.col("dmax"))
                & (F.col("runmax").isNull() | (F.col("dmax") > F.col("runmax")))
            )
            .drop("dmax", "runmax")
        )

    survivors = frontier(o, ["pb"])
    return frontier(survivors, []).select(
        "o_orderkey", "cents", F.col("odate").alias("order_date")
    )


QUERIES["skyline_two_phase_orders"] = skyline_two_phase_orders

ORACLE["skyline_two_phase_orders"] = """
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS odate
  FROM orders
), lvl AS (
  SELECT cents, max(odate) AS dmax FROM o GROUP BY cents
), fr AS (
  SELECT cents, dmax,
         max(dmax) OVER (ORDER BY cents DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS runmax
  FROM lvl
)
SELECT o.o_orderkey, o.cents, o.odate AS order_date
FROM o JOIN fr ON o.cents = fr.cents AND o.odate = fr.dmax
WHERE fr.runmax IS NULL OR fr.dmax > fr.runmax
"""


# --- rolling active users ----------------------------------------------------
WAU_WINDOW = 7  # trailing days, inclusive


def rolling_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU per day — the product-analytics staple,
    and the canonical SLIDING-WINDOW COUNT DISTINCT, which no engine's
    window frame expresses directly (count(DISTINCT) over a moving frame
    isn't supported; collect_set-in-frame holds the whole set per row).
    The scalable form: dedup events to (user, day) pairs FIRST (one
    exchange over keys, not events), fan each pair out to the ≤ 7 target
    days it supports (map-side explode of a constant range — the
    dimension-bounded fan-out, same move as leadlag_xcorr's lag explode),
    semi-join to observed days, and run one distinct-count per target
    day. Cost: |user-day pairs|·7 small rows through one aggregate —
    never a per-row set state. Output: (day, dau, wau_7d), exact BIGINTs.
    [extension]"""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    days = ev.select("d").distinct()
    fan = ev.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(WAU_WINDOW - 1))).alias("k"),
        "d",
    ).select("user_id", F.expr("date_add(d, k)").alias("day"))
    act = fan.join(
        F.broadcast(days.withColumnRenamed("d", "day")), "day", "left_semi"
    )
    wau = act.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau_7d")
    )
    dau = ev.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return dau.join(wau, "day").select("day", "dau", "wau_7d")


QUERIES["rolling_weekly_active_users"] = rolling_weekly_active_users

ORACLE["rolling_weekly_active_users"] = f"""
WITH pd AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
wdays AS (SELECT DISTINCT d FROM pd),
x AS (
  SELECT DISTINCT p.user_id, dy.d AS day
  FROM pd p JOIN wdays dy
    ON p.d <= dy.d AND p.d >= dy.d - {WAU_WINDOW - 1}
),
w AS (SELECT day, count(*) AS wau_7d FROM x GROUP BY day),
dau AS (SELECT d AS day, count(DISTINCT user_id) AS dau FROM pd GROUP BY d)
SELECT day, dau.dau, w.wau_7d FROM dau JOIN w USING (day)
"""
