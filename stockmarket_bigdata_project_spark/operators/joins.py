"""Join operators: equi / left / semi / anti / cross, stream-static shape,
interval (range) join, as-of join.

Reference parity cites (into /root/reference):
  J1 stream-static 2-key equi-join     spark_consumer.py:111-115
  J2 left outer + fillna               build_training_dataset.py:62-63
  J4 inner join on date                app.py:360-362
  J5 ±24h interval join                stock_pipeline.py:155-179 — the reference
     does this row-at-a-time with one MongoClient + one range query PER ROW
     (its worst anti-pattern, SURVEY §4.3). Here it is one set-based join.
  J6 as-of (latest prior record)       predictor_service.py:38-66
  J7 union-as-concat                   download_finance_stooq.py:81 (relational.py)

Scale notes:
  * interval_join_48h uses the date-bucket expansion trick (SURVEY §4.2):
    Spark executes a pure range predicate as a broadcast-nested-loop join
    (O(n·m)); exploding each anchor into its covered date buckets turns it
    into an EQUI-join on (key, bucket) + residual range filter — shuffle
    hash/sort-merge, linear at 100 TB.
  * the small dimension sides are broadcast explicitly; at real scale AQE
    makes the same decision from runtime stats.
  * as-of join ships two forms: the union-asof window form (one shuffle +
    partition-local sort, codegen — the scale path) and an
    applyInPandas(merge_asof) form — the Arrow-batched escape hatch template
    for per-group logic Spark genuinely can't express.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..functions.exact import dec_sum
from .gold import SUPPLIER_DAILY_SQL, orders_daily_rollup, supplier_daily_ohlcv


# --- J1: 2-key conjunctive equi-join (stream-static shape) ------------------
def join_enrich_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich each lineitem with its (supplier, day) OHLCV context — the
    stream-static join shape: big fact side ⋈ derived daily dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = supplier_daily_ohlcv(spark, sf_dir)
    fact = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.to_date("l_shipdate").alias("trade_date"),
        "l_extendedprice",
    )
    return fact.join(daily, on=["l_suppkey", "trade_date"], how="inner").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "trade_date",
        "l_extendedprice",
        "high_px",
        "low_px",
        "volume",
    )


# --- J2: left outer + fillna -------------------------------------------------
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice").alias("total_spent"),
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .na.fill({"n_orders": 0, "total_spent": 0.0})
        .select("c_custkey", "c_name", "c_mktsegment", "n_orders", "total_spent")
    )


# --- J4: inner join on date (dashboard correlation merge) -------------------
def join_daily_market_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = supplier_daily_ohlcv(spark, sf_dir)
    a = orders_daily_rollup(spark, sf_dir)
    return s.join(F.broadcast(a), on="trade_date", how="inner").select(
        "trade_date", "l_suppkey", "close_px", "order_count", "avg_order_price"
    )


# --- semi / anti joins -------------------------------------------------------
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= "1998-01-01")
    return c.join(
        recent, c.c_custkey == recent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- cross join --------------------------------------------------------------
def cross_join_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.select(F.col("r_name").alias("region_name"))
        .crossJoin(n.select(F.col("n_name").alias("nation_name")))
    )


# --- dimension join + agg (star-schema pattern) ------------------------------
def revenue_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ part → agg: the canonical star-schema probe. The join is
    UNHINTED (r10 verdict: part scales linearly with SF — ≈200k × SF rows —
    so a forced broadcast is an OOM at the 100 TB design point); AQE
    broadcasts it at every SF where it fits, and then the fact side never
    shuffles for the join — only the final tiny agg shuffles partials."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- J5: interval join (±24 h window), set-based ----------------------------
def interval_join_48h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each (user_id, day) anchor: aggregate that user's events with
    ts ∈ [day − 1 day, day + 1 day) — the reference's 'reddit_posts_24h'
    feature, which actually spans 48 h (stock_pipeline.py:159-168,207;
    SURVEY §7.3-2), done as ONE equi-join instead of a per-row lookup.

    Bucket expansion: an event at date d can only serve anchors d and d+1,
    so emit two (user_id, anchor_bucket) copies of each event and equi-join —
    no BNLJ, plain shuffle join, linear at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    anchors = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    expanded = ev.select(
        "user_id",
        "ts",
        "value",
        F.explode(
            F.array(F.to_date("ts"), F.date_add(F.to_date("ts"), 1))
        ).alias("day"),
    )
    joined = anchors.join(expanded, on=["user_id", "day"], how="inner").filter(
        (F.col("ts") >= F.date_sub(F.col("day"), 1).cast("timestamp"))
        & (F.col("ts") < F.date_add(F.col("day"), 1).cast("timestamp"))
    )
    return joined.groupBy("user_id", "day").agg(
        F.count("*").alias("events_48h"),
        (
            dec_sum("value")
            / F.count("value")
        ).alias("avg_value_48h"),
        dec_sum("value").alias(
            "total_value_48h"
        ),
    )


# --- theta (band) join -------------------------------------------------------
# Top tier is open-ended: TPC-H o_totalprice can reach ~793k (7 lineitems ×
# ~105k × (1+tax)); a finite cap silently dropped those orders and the tier
# totals no longer reconciled with total revenue.
PRICE_TIERS = [
    ("budget", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("premium", 150_000.0, 300_000.0),
    ("luxury", 300_000.0, float("inf")),
]


def band_join_order_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join against a small band dimension: classify each order into
    an (unequal-width) price tier via `lo <= price < hi`.

    The complementary range-join strategy to interval_join_48h: when the
    range side is a HANDFUL of bands, broadcast nested-loop IS the right
    plan — each fact row tests 4 predicates map-side, the fact table never
    shuffles, and the only exchange is the final tier aggregation (4 groups).
    Bucket expansion would pay an explode for nothing here. [extension]
    """
    o = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(PRICE_TIERS, "tier string, lo double, hi double")
    j = o.join(
        F.broadcast(tiers),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return j.groupBy("tier").agg(
        F.count("*").alias("n_orders"),
        F.sum(dec).cast("double").alias("tier_revenue"),
        (F.sum(dec).cast("double") / F.count("*")).alias("avg_order_price"),
    )


# --- J6: as-of join ----------------------------------------------------------
def _asof_sides(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    left = o.select("o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("day"))
    right = (
        o.groupBy("o_custkey", F.to_date("o_orderdate").alias("day"))
        .agg(dec_sum("o_totalprice").alias("day_total"))
        .withColumnRenamed("o_custkey", "r_custkey")
        .withColumnRenamed("day", "r_day")
    )
    return left, right


def asof_join_prev_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each order: the customer's most recent STRICTLY earlier order day
    total. Union-asof: tag left rows side=0 and right rows side=1, sort each
    customer by (day, side), and take ``last(day_total, ignorenulls)`` over
    the strictly-preceding frame — right rows on the SAME day sort after the
    left row, so exact-day matches are excluded (strict inequality), and left
    rows carry null day_total so they never match each other. One shuffle +
    one partition-local sort, fully codegen — at 100 TB this is a single
    exchange on the join key, vs. the per-group pandas alternative below
    (kept as asof_join_merge_pandas) which pays a Python round-trip.
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    left, right = _asof_sides(spark, sf_dir)
    lu = left.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.lit(0).alias("side"),
        F.lit(None).cast("double").alias("day_total"),
    )
    ru = right.select(
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("r_custkey").alias("o_custkey"),
        F.col("r_day").alias("day"),
        F.lit(1).alias("side"),
        "day_total",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day", "side")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        lu.unionByName(ru)
        .withColumn("prev_day_total", F.last("day_total", ignorenulls=True).over(w))
        .filter(F.col("side") == 0)
        .select("o_orderkey", "o_custkey", "day", "prev_day_total")
    )


def asof_join_merge_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via applyInPandas(merge_asof) per customer group —
    the Arrow-batched escape hatch for operators Spark lacks natively. Slower
    than the union-asof window form (per-group pandas overhead) but kept as
    the template for genuinely non-window-expressible per-group logic.

    Boundary discipline (guide §4 / §2.3 "narrower types"): days cross the
    Python boundary as int32 day numbers, not DateType — a date column
    arrives in pandas as python-object cells that every group must
    pd.to_datetime() before merge_asof can use them, and the object→
    datetime64 conversion was the dominant per-group cost (r15 A/B: 6.3 s
    shipped vs 4.4 s int-days vs the 2.9 s identity-function floor at this
    group cardinality; the remaining gap over the floor is merge_asof
    itself). The left/right discriminator is o_orderkey's nullness — the
    former 'side' string column shipped ~300 k constant strings through
    Arrow for one bit. day_num converts back to DateType on the JVM side,
    so the declared schema is unchanged."""
    left, right = _asof_sides(spark, sf_dir)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        l = pdf[pdf["o_orderkey"].notna()][["o_orderkey", "o_custkey", "day_num"]]
        r = pdf[pdf["o_orderkey"].isna()][["day_num", "day_total"]]
        l = l.sort_values("day_num", kind="mergesort")
        r = r.sort_values("day_num", kind="mergesort")
        m = pd.merge_asof(
            l, r, on="day_num", direction="backward", allow_exact_matches=False
        )
        m = m.rename(columns={"day_total": "prev_day_total"})
        return m[["o_orderkey", "o_custkey", "day_num", "prev_day_total"]]

    lu = left.select(
        "o_orderkey",
        "o_custkey",
        F.unix_date("day").alias("day_num"),
        F.lit(None).cast("double").alias("day_total"),
    )
    ru = right.select(
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("r_custkey").alias("o_custkey"),
        F.unix_date("r_day").alias("day_num"),
        "day_total",
    )
    both = lu.unionByName(ru)
    out_schema = "o_orderkey long, o_custkey long, day_num int, prev_day_total double"
    # Pin Arrow-UDF parallelism (same rationale as suppression_window_dedup):
    # AQE coalesces by byte size and serializes the CPU-bound per-group
    # Python pass; an explicit repartition(N, key) is the exact partitioning
    # applyInPandas needs and is exempt from AQE coalescing.
    n = spark.sparkContext.defaultParallelism
    merged = (
        both.repartition(n, "o_custkey")
        .groupBy("o_custkey")
        .applyInPandas(merge_group, out_schema)
    )
    return merged.select(
        "o_orderkey",
        "o_custkey",
        F.date_from_unix_date("day_num").alias("day"),
        "prev_day_total",
    )


QUERIES = {
    "join_enrich_daily": join_enrich_daily,
    "customer_order_stats": customer_order_stats,
    "join_daily_market_activity": join_daily_market_activity,
    "semi_join_active_customers": semi_join_active_customers,
    "anti_join_inactive_customers": anti_join_inactive_customers,
    "cross_join_region_nation": cross_join_region_nation,
    "revenue_by_brand": revenue_by_brand,
    "interval_join_48h": interval_join_48h,
    "band_join_order_tiers": band_join_order_tiers,
    "asof_join_prev_order": asof_join_prev_order,
    "asof_join_merge_pandas": asof_join_merge_pandas,
}

ORACLE = {
    "join_enrich_daily": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL})
SELECT f.l_orderkey, f.l_linenumber, f.l_suppkey, f.trade_date,
       f.l_extendedprice, s.high_px, s.low_px, s.volume
FROM (SELECT l_orderkey, l_linenumber, l_suppkey,
             CAST(l_shipdate AS DATE) AS trade_date, l_extendedprice
      FROM lineitem) f
JOIN stock s USING (l_suppkey, trade_date)
""",
    "customer_order_stats": """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_spent
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_name, c_mktsegment,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(total_spent, 0.0) AS total_spent
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
""",
    "join_daily_market_activity": f"""
WITH stock AS ({SUPPLIER_DAILY_SQL}),
activity AS (
  SELECT CAST(o_orderdate AS DATE) AS trade_date, count(*) AS order_count,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_price
  FROM orders GROUP BY 1
)
SELECT s.trade_date, s.l_suppkey, s.close_px, a.order_count, a.avg_order_price
FROM stock s JOIN activity a USING (trade_date)
""",
    "semi_join_active_customers": """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderdate >= '1998-01-01')
""",
    "anti_join_inactive_customers": """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
    "cross_join_region_nation": """
SELECT r_name AS region_name, n_name AS nation_name FROM region CROSS JOIN nation
""",
    "revenue_by_brand": """
SELECT p_brand,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
    "band_join_order_tiers": """
WITH tiers(tier, lo, hi) AS (
  VALUES ('budget', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
         ('premium', 150000.0, 300000.0),
         ('luxury', 300000.0, CAST('infinity' AS DOUBLE))
)
SELECT tier, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tier_revenue,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_price
FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier
""",
    "interval_join_48h": """
WITH anchors AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT a.user_id, a.day,
       count(*) AS events_48h,
       CAST(sum(CAST(e.value AS DECIMAL(27,2))) AS DOUBLE) / count(e.value) AS avg_value_48h,
       CAST(sum(CAST(e.value AS DECIMAL(27,2))) AS DOUBLE) AS total_value_48h
FROM anchors a
JOIN events e
  ON e.user_id = a.user_id
 AND e.ts >= CAST(a.day AS TIMESTAMP) - INTERVAL 1 DAY
 AND e.ts <  CAST(a.day AS TIMESTAMP) + INTERVAL 1 DAY
GROUP BY a.user_id, a.day
""",
    "asof_join_prev_order": """
WITH daily AS (
  SELECT o_custkey AS r_custkey, CAST(o_orderdate AS DATE) AS r_day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS day_total
  FROM orders GROUP BY 1, 2
)
SELECT o.o_orderkey, o.o_custkey, CAST(o.o_orderdate AS DATE) AS day,
       d.day_total AS prev_day_total
FROM orders o
ASOF LEFT JOIN daily d
  ON o.o_custkey = d.r_custkey AND CAST(o.o_orderdate AS DATE) > d.r_day
""",
    "asof_join_merge_pandas": """
WITH daily AS (
  SELECT o_custkey AS r_custkey, CAST(o_orderdate AS DATE) AS r_day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS day_total
  FROM orders GROUP BY 1, 2
)
SELECT o.o_orderkey, o.o_custkey, CAST(o.o_orderdate AS DATE) AS day,
       d.day_total AS prev_day_total
FROM orders o
ASOF LEFT JOIN daily d
  ON o.o_custkey = d.r_custkey AND CAST(o.o_orderdate AS DATE) > d.r_day
""",
}


# --- CDC snapshot diff --------------------------------------------------------
CDC_OLD_MOD = 7  # o_orderkey % 7 == 0 → row absent from the OLD snapshot
CDC_NEW_MOD = 5  # o_orderkey % 5 == 0 → row absent from the NEW snapshot
CDC_UPD_MOD = 3  # o_orderkey % 3 == 0 → price mutated (+100 cents) in NEW


def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots (Delta/Iceberg
    `table_changes` semantics): classify every key as insert / delete /
    update by one full-outer equi-join on the primary key; unchanged rows
    are dropped. The snapshots are deterministic id-slices of orders with
    a deterministic price mutation, standing in for two committed versions.

    Scale shape: the diff is a single co-partitioned full-outer join on
    the key plus map-side filters — the standard incremental-maintenance
    plan; nothing is collected and no side is broadcast (both snapshots
    are table-sized). Complements `upsert_merge_daily` (the apply step)
    and the SCD2 queries (the history step). [extension]"""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    old = o.filter(F.col("o_orderkey") % CDC_OLD_MOD != 0).select(
        "o_orderkey", F.col("cents").alias("old_cents")
    )
    new = o.filter(F.col("o_orderkey") % CDC_NEW_MOD != 0).select(
        "o_orderkey",
        (
            F.col("cents")
            + F.when(F.col("o_orderkey") % CDC_UPD_MOD == 0, 100).otherwise(0)
        ).alias("new_cents"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_cents").isNull(), "insert")
        .when(F.col("new_cents").isNull(), "delete")
        .when(F.col("old_cents") != F.col("new_cents"), "update")
    )
    return j.select(
        "o_orderkey", "old_cents", "new_cents", change.alias("change_type")
    ).filter(change.isNotNull())


QUERIES["cdc_snapshot_diff"] = cdc_snapshot_diff

ORACLE["cdc_snapshot_diff"] = f"""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), old AS (
  SELECT o_orderkey, cents AS old_cents FROM o
  WHERE o_orderkey % {CDC_OLD_MOD} <> 0
), new AS (
  SELECT o_orderkey,
         cents + CASE WHEN o_orderkey % {CDC_UPD_MOD} = 0 THEN 100 ELSE 0 END
           AS new_cents
  FROM o WHERE o_orderkey % {CDC_NEW_MOD} <> 0
)
SELECT o_orderkey, old_cents, new_cents,
       CASE WHEN old_cents IS NULL THEN 'insert'
            WHEN new_cents IS NULL THEN 'delete'
            WHEN old_cents <> new_cents THEN 'update' END AS change_type
FROM old FULL OUTER JOIN new USING (o_orderkey)
WHERE old_cents IS NULL OR new_cents IS NULL OR old_cents <> new_cents
"""


ASOF_TOL_DAYS = 7  # forward as-of tolerance bound


def asof_join_next_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance bound — the
    pandas merge_asof(direction='forward', tolerance=...) surface: for
    each order, the customer's NEXT strictly-later order-day total, but
    only if it lands within ASOF_TOL_DAYS; otherwise null (plus the gap
    in days). Same union-asof single-shuffle plan as asof_join_prev_order
    with the frame reversed: sides flip (right rows sort BEFORE left rows
    on equal days, so same-day never matches the strict 'next'), the
    frame is (1 FOLLOWING, UNBOUNDED), and first(..., ignorenulls) picks
    the nearest following day — the tolerance is a map-side datediff
    check AFTER the match, exactly merge_asof's semantics. One exchange
    on the join key, fully codegen."""
    left, right = _asof_sides(spark, sf_dir)
    lu = left.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.lit(1).alias("side"),
        F.lit(None).cast("date").alias("m_day"),
        F.lit(None).cast("double").alias("m_total"),
    )
    ru = right.select(
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("r_custkey").alias("o_custkey"),
        F.col("r_day").alias("day"),
        F.lit(0).alias("side"),
        F.col("r_day").alias("m_day"),
        F.col("day_total").alias("m_total"),
    )
    # Reversed running frame, NOT first() over (1 FOLLOWING, UNBOUNDED):
    # Spark re-scans the partition remainder per row for an
    # UnboundedFollowing frame — O(rows²) on a hot customer — while the
    # descending-order (UNBOUNDED, 1 PRECEDING) running last() computes the
    # identical "nearest strictly-following row" in O(rows) (same rewrite
    # as interpolate_daily; PERFORMANCE.md scale study).
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("day"), F.desc("side"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gap = F.datediff(F.col("n_day"), F.col("day"))
    within = F.col("n_day").isNotNull() & (gap <= ASOF_TOL_DAYS)
    return (
        lu.unionByName(ru)
        .withColumn("n_day", F.last("m_day", ignorenulls=True).over(w))
        .withColumn("n_total", F.last("m_total", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "o_orderkey",
            "o_custkey",
            "day",
            F.when(within, F.col("n_total")).alias("next_day_total"),
            F.when(within, gap.cast("int")).alias("gap_days"),
        )
    )


QUERIES["asof_join_next_tolerance"] = asof_join_next_tolerance

ORACLE["asof_join_next_tolerance"] = f"""
WITH l AS (
  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS day FROM orders
), r AS (
  SELECT o_custkey AS r_custkey, CAST(o_orderdate AS DATE) AS r_day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS day_total
  FROM orders GROUP BY 1, 2
), u AS (
  SELECT o_orderkey, o_custkey, day, 1 AS side,
         NULL::DATE AS m_day, NULL::DOUBLE AS m_total
  FROM l
  UNION ALL
  SELECT NULL, r_custkey, r_day, 0, r_day, day_total FROM r
), wnd AS (
  SELECT *,
         first_value(m_day IGNORE NULLS) OVER win AS n_day,
         first_value(m_total IGNORE NULLS) OVER win AS n_total
  FROM u
  WINDOW win AS (PARTITION BY o_custkey ORDER BY day, side
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT o_orderkey, o_custkey, day,
       CASE WHEN n_day IS NOT NULL
             AND date_diff('day', day, n_day) <= {ASOF_TOL_DAYS}
            THEN n_total END AS next_day_total,
       CASE WHEN n_day IS NOT NULL
             AND date_diff('day', day, n_day) <= {ASOF_TOL_DAYS}
            THEN CAST(date_diff('day', day, n_day) AS INTEGER)
            END AS gap_days
FROM wnd WHERE side = 1
"""
