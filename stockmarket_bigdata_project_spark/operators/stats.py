"""Exact order statistics and regression aggregates — [extension].

The reference's notebooks reach for pandas `describe()` / sklearn
`LinearRegression` on collected data (02_Spark_SQL_EDA.ipynb,
06_XGBoost_model.ipynb cells 4-10); at warehouse scale those must run inside
the engine. Four families, all value-level oracle-checked:

  * exact_price_quantiles — EXACT percentile_cont (not approx sketches,
    which live in operators/sketches.py). Distributed cost is one
    sort-within-group; determinism comes from interpolating over integer
    CENTS: every intermediate (a, b, b-a, g·(b-a), a+g·(b-a) for dyadic g)
    is an exactly-representable binary64, so Spark's and DuckDB's
    algebraically-different interpolation formulas produce the identical
    double.
  * mode_event_type — deterministic mode: most frequent value, ties broken
    lexicographically (the built-in mode() in either engine picks an
    arbitrary element of the argmax set). One shuffle (count groupBy), then
    a 1-row-per-group window.
  * event_type_string_agg — ordered string aggregation: collect_set →
    array_sort → concat_ws is the engine-neutral form (collect order is
    undefined; the sort makes it canonical). Partial aggregation still
    applies map-side to the small distinct set.
  * price_quantity_regression — regr_slope / regr_intercept / regr_r2 by
    exact power sums (the built-ins merge partial moments in shuffle order,
    not even run-to-run stable). Sxx/Syy exceed 2^53 → big_sum's
    decimal-string route (COVERAGE.md playbook 3b).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..functions.exact import big_sum, sql_big_sum

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


def exact_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/median/p75 of order value per priority, interpolated over
    integer cents (see module docstring for why this is cross-engine
    bit-deterministic while percentile_cont over raw doubles is not)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_CENTS)
    qs = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (F.percentile(cents, F.lit(0.25)) / 100.0).alias("p25_price"),
        (F.percentile(cents, F.lit(0.5)) / 100.0).alias("median_price"),
        (F.percentile(cents, F.lit(0.75)) / 100.0).alias("p75_price"),
    )
    return qs


def mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode of event_type per user-id bucket: argmax count,
    ties to the lexicographically smallest value."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        (F.col("user_id") % 10).alias("bucket"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("bucket").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("bucket", F.col("event_type").alias("mode_event_type"), "n")
    )


def event_type_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical ordered string aggregation per user-id bucket."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy((F.col("user_id") % 10).alias("bucket")).agg(
        F.concat_ws("|", F.array_sort(F.collect_set("event_type"))).alias("types"),
        F.count_distinct("event_type").alias("n_types"),
    )


def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of extendedprice (dollars) on quantity per returnflag, from exact
    power sums: slope/intercept/r² are pure binary64 algebra over
    identically-converted operands. The slope is in dollars per unit, so the
    cents scaling divides out once at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,0)")
    y = F.expr("CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        big_sum(x).alias("sx"),
        big_sum(y).alias("sy"),
        big_sum(x * x).alias("sxx"),
        big_sum(x * y).alias("sxy"),
        big_sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x_n
    return sums.select(
        "l_returnflag",
        "n",
        (slope / 100.0).alias("slope_dollars_per_unit"),
        ((F.col("sy") / n - slope * (F.col("sx") / n)) / 100.0).alias(
            "intercept_dollars"
        ),
        (cov_n * cov_n / (var_x_n * var_y_n)).alias("r2"),
    )


def nth_value_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/nth/last_value over an explicit unbounded frame: podium prices
    per priority with full tie-breaks, deduplicated to one row per group."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_orderpriority",
            F.first("o_totalprice").over(w).alias("top_price"),
            F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
            F.last("o_totalprice").over(w).alias("min_price"),
        )
        .distinct()
    )


Z_THRESHOLD = 2.5


def value_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > Z_THRESHOLD): the anomaly-
    detection shape (per-group moments → broadcast back → map-side score).
    Moments come from exact power sums (big_sum's decimal-string route —
    S2 exceeds 2^53), and z is one shared binary64 algebra over
    bit-identical operands, so even the threshold comparison lands
    identically in both engines. Scale: the moments relation is
    |event_type|-sized → broadcast; the fact table never shuffles."""
    ev = load_table(spark, sf_dir, "events")
    cents_dec = F.expr("CAST(round(value * 100) AS DECIMAL(18,0))")
    moments = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        big_sum(cents_dec).alias("s1"),
        big_sum(cents_dec * cents_dec).alias("s2"),
    )
    j = ev.join(F.broadcast(moments), "event_type")
    n = F.col("n").cast("double")
    x = F.expr("CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)")
    z = (n * x - F.col("s1")) / F.sqrt(
        n * (n * F.col("s2") - F.col("s1") * F.col("s1")) / (n - 1)
    )
    return (
        j.select("event_id", "event_type", "value", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > Z_THRESHOLD)
    )


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row data-quality audit of the events feed — the expectations
    report (null/negative/duplicate/malformed counts) a pipeline gates
    ingestion on. One scan, one partial+final aggregate; the props check is
    an anchored regex in the RE2∩Java-portable subset (same contract as
    pii_redaction)."""
    ev = load_table(spark, sf_dir, "events")
    wellformed = F.col("props").rlike(r'^\{"k": -?\d+\}$')
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias(
            "n_null_value"
        ),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias(
            "n_negative_value"
        ),
        (F.count("*") - F.count_distinct("event_id")).alias("n_dup_event_ids"),
        F.sum(F.when(wellformed, 0).otherwise(1)).alias("n_malformed_props"),
        F.count_distinct("event_type").alias("n_event_types"),
    )


QUERIES = {
    "exact_price_quantiles": exact_price_quantiles,
    "mode_event_type": mode_event_type,
    "event_type_string_agg": event_type_string_agg,
    "price_quantity_regression": price_quantity_regression,
    "nth_value_order_prices": nth_value_order_prices,
    "value_zscore_outliers": value_zscore_outliers,
    "dq_profile": dq_profile,
}

ORACLE = {
    "exact_price_quantiles": f"""
SELECT o_orderpriority, count(*) AS n_orders,
       quantile_cont({_CENTS}, 0.25) / 100.0 AS p25_price,
       quantile_cont({_CENTS}, 0.5) / 100.0 AS median_price,
       quantile_cont({_CENTS}, 0.75) / 100.0 AS p75_price
FROM orders GROUP BY o_orderpriority
""",
    "mode_event_type": """
WITH counts AS (
  SELECT user_id % 10 AS bucket, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT bucket, event_type, n,
         row_number() OVER (PARTITION BY bucket ORDER BY n DESC, event_type) AS rn
  FROM counts
)
SELECT bucket, event_type AS mode_event_type, n FROM ranked WHERE rn = 1
""",
    "event_type_string_agg": """
SELECT user_id % 10 AS bucket,
       string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS types,
       count(DISTINCT event_type) AS n_types
FROM events GROUP BY 1
""",
    "price_quantity_regression": f"""
WITH sums AS (
  SELECT l_returnflag, count(*) AS n,
         {sql_big_sum('l_quantity')} AS sx,
         {sql_big_sum('round(l_extendedprice * 100)')} AS sy,
         {sql_big_sum('l_quantity * l_quantity')} AS sxx,
         {sql_big_sum('l_quantity * round(l_extendedprice * 100)')} AS sxy,
         {sql_big_sum('round(l_extendedprice * 100) * round(l_extendedprice * 100)')} AS syy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0 AS slope_dollars_per_unit,
       (sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx) * (sx / n)) / 100.0
           AS intercept_dollars,
       (n * sxy - sx * sy) * (n * sxy - sx * sy)
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM sums
""",
    "nth_value_order_prices": """
SELECT DISTINCT o_orderpriority,
       first_value(o_totalprice) OVER w AS top_price,
       nth_value(o_totalprice, 3) OVER w AS third_price,
       last_value(o_totalprice) OVER w AS min_price
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
}

ORACLE["value_zscore_outliers"] = f"""
WITH moments AS (
  SELECT event_type, count(value) AS n,
         {sql_big_sum("CAST(round(value * 100) AS HUGEINT)")} AS s1,
         {sql_big_sum("CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS HUGEINT)")} AS s2
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       (CAST(n AS DOUBLE) * CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) - s1)
         / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * s2 - s1 * s1)
                / (CAST(n AS DOUBLE) - 1)) AS zscore
FROM events e JOIN moments m USING (event_type)
WHERE abs((CAST(n AS DOUBLE) * CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) - s1)
          / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * s2 - s1 * s1)
                 / (CAST(n AS DOUBLE) - 1))) > {Z_THRESHOLD}
"""

ORACLE["dq_profile"] = r"""
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_value,
       CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative_value,
       count(*) - count(DISTINCT event_id) AS n_dup_event_ids,
       CAST(sum(CASE WHEN regexp_matches(props, '^\{"k": -?\d+\}$')
                     THEN 0 ELSE 1 END) AS BIGINT)
         AS n_malformed_props,
       count(DISTINCT event_type) AS n_event_types
FROM events
"""


def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group anomaly detection: median / MAD (median absolute
    deviation) with a 3·MAD fence — the heavy-tail-safe twin of
    `value_zscore_outliers` (mean/stddev break under the very outliers
    they are meant to find). Exactness: values quantize to integer cents;
    an exact median of integers is integer or half-integer (one dyadic
    binary64), absolute deviations are then 0.5-step dyadics, the MAD is a
    0.25-step dyadic, and 3·MAD and every comparison stay exact — so the
    flag is bit-identical across engines with no rounding anywhere (the
    exact_price_quantiles precedent).

    Scale shape: the K-row median/MAD tables broadcast back onto the fact
    scan (no fact-side join shuffle); the two exact-percentile aggregates
    do carry values in their buffers through one exchange each — inherent
    to EXACT grouped medians (the approximate path for 100 TB is
    `approx_quantiles_prices`; this is its exact, oracle-checkable twin,
    with group count bounded by the event-type domain). [extension]"""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).alias("cents"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("cents") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                (F.col("adev") > 3 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .select("event_type", "med", "mad", "n_rows", "n_outliers")
    )


QUERIES["robust_outliers_mad"] = robust_outliers_mad

ORACLE["robust_outliers_mad"] = """
WITH ev AS (
  SELECT event_type, round(value * 100) AS cents FROM events
), med AS (
  SELECT event_type, median(cents) AS med FROM ev GROUP BY event_type
), dev AS (
  SELECT e.event_type, m.med, abs(e.cents - m.med) AS adev
  FROM ev e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type, d.med, a.mad, count(*) AS n_rows,
       CAST(sum(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type, d.med, a.mad
"""


DRIFT_BIN_CENTS = 5000  # 50-unit value bins over events.value (0..~560)


def data_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two event slices — the MLOps
    check run before every model refresh (PSI/KS in production; here the
    per-bin rate deltas those statistics are computed FROM, kept
    transcendental-free so the report value-checks bit-for-bit). The
    slices are deterministic: odd vs even day-of-month, standing in for
    reference vs current windows.

    Per equi-width value bin: counts in both slices, each slice's rate in
    round-half-up micro units (the integer-rational quantizer — exact
    integer totals, one binary64 division at the boundary), and the
    absolute rate delta. Scale shape: bin ids computed map-side, ONE
    shuffle of (bin, partial counts), totals broadcast back onto the
    K-row bin table. Values are non-negative so the integer bin division
    has no floor-vs-truncate cross-engine hazard. [extension]"""
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.dayofmonth("ts") % 2 == 1).alias("is_ref"),
    )
    binned = ev.groupBy(
        F.expr(f"cents div {DRIFT_BIN_CENTS}").cast("int").alias("bin")
    ).agg(
        F.sum(F.col("is_ref").cast("long")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("n_cur"),
    )
    totals = binned.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    # nullif guards: an empty slice (t_ref/t_cur = 0) must yield NULL on
    # both engines, not NULL-vs-error divergence (DuckDB raises on /0)
    rate_ref = F.expr(
        "(2 * n_ref * 1000000 + t_ref) div nullif(2 * t_ref, 0)"
    )
    rate_cur = F.expr(
        "(2 * n_cur * 1000000 + t_cur) div nullif(2 * t_cur, 0)"
    )
    return binned.crossJoin(F.broadcast(totals)).select(
        "bin",
        "n_ref",
        "n_cur",
        (rate_ref / F.lit(1_000_000.0)).alias("rate_ref"),
        (rate_cur / F.lit(1_000_000.0)).alias("rate_cur"),
        (
            F.abs(rate_ref - rate_cur) / F.lit(1_000_000.0)
        ).alias("rate_delta"),
    )


N_DECILES = 10


def equi_depth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning of order value — the feature
    bucketizer for tree/embedding models. Boundary i is the EXACT ORDER
    STATISTIC at lower rank ceil(i·n/10) = (i·n+9) div 10 over integer
    cents (percentile_disc semantics), computed with NO interpolation and
    NO float probability anywhere: floats can't round-trip p·n at exact
    integer ranks (0.1·15000 under binary64 p lands a whole rank off), and
    interpolated boundaries were the last ulp-sensitive construct in the
    determinism set — rank selection removes the class.

    Plan: ONE hash shuffle of the fact table onto the cents key for the
    value histogram (cost ∝ distinct values, the same state bound the old
    percentile() aggregate buffered in one pass), a TWO-LEVEL distributed
    prefix sum over that histogram (within-bucket running sums partitioned
    by a coarse cents bucket + a broadcast running-offset table over the
    ≤|domain|/10⁵ buckets — no single-partition pass over the full
    histogram), a broadcast 9-row rank join, and a map-side boundary count
    per row. All-integer counts, so the two-level decomposition is exact
    in any partitioning. Still no RANGE partitioning of the fact table —
    ntile() would globally sort it. [extension]"""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr(_CENTS).alias("cents")
    )
    ranks = o.agg(F.count("*").alias("n")).select(
        F.explode(F.sequence(F.lit(1), F.lit(N_DECILES - 1))).alias("i"),
        F.col("n"),
    ).select("i", F.expr(f"(i * n + {N_DECILES - 1}) div {N_DECILES}").alias("r"))
    hist = o.groupBy("cents").agg(F.count("*").alias("cnt")).withColumn(
        "bkt", F.expr("cents div 100000")
    )
    within = F.sum("cnt").over(
        Window.partitionBy("bkt").orderBy("cents")
    )
    offsets = (
        hist.groupBy("bkt")
        .agg(F.sum("cnt").alias("bt"))
        .select(
            "bkt",
            F.coalesce(
                F.sum("bt").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    cum = (
        hist.withColumn("wc", within)
        .join(F.broadcast(offsets), "bkt")
        .select("cents", (F.col("off") + F.col("wc")).alias("cc"))
    )
    bounds = (
        cum.join(F.broadcast(ranks), F.col("cc") >= F.col("r"))
        .groupBy("i")
        .agg(F.min("cents").alias("q"))
        .agg(F.sort_array(F.collect_list("q")).alias("qs"))
    )
    assigned = o.crossJoin(F.broadcast(bounds)).select(
        "cents",
        (
            F.lit(1)
            + F.size(F.filter("qs", lambda q: F.col("cents") > q))
        ).alias("decile"),
    )
    return assigned.groupBy("decile").agg(
        F.count("*").alias("n_orders"),
        (F.min("cents") / 100.0).alias("min_price"),
        (F.max("cents") / 100.0).alias("max_price"),
    )


QUERIES["data_drift_report"] = data_drift_report
QUERIES["equi_depth_deciles"] = equi_depth_deciles

ORACLE["data_drift_report"] = f"""
WITH ev AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         (day(ts) % 2 = 1) AS is_ref
  FROM events
), binned AS (
  SELECT CAST(cents // {DRIFT_BIN_CENTS} AS INTEGER) AS bin,
         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
  FROM ev GROUP BY 1
), totals AS (
  SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
         CAST(sum(n_cur) AS BIGINT) AS t_cur
  FROM binned
)
SELECT bin, n_ref, n_cur,
       ((2 * n_ref * 1000000 + t_ref) // nullif(2 * t_ref, 0)) / 1000000.0
         AS rate_ref,
       ((2 * n_cur * 1000000 + t_cur) // nullif(2 * t_cur, 0)) / 1000000.0
         AS rate_cur,
       abs(((2 * n_ref * 1000000 + t_ref) // nullif(2 * t_ref, 0))
         - ((2 * n_cur * 1000000 + t_cur) // nullif(2 * t_cur, 0)))
         / 1000000.0 AS rate_delta
FROM binned, totals
"""

# boundary = exact order statistic at integer rank (i*n+9)//10 — spelled
# out with a histogram + running count rather than quantile_disc/
# percentile_disc, whose index conventions differ between engines
ORACLE["equi_depth_deciles"] = f"""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
), ranks AS (
  SELECT i, (i * n + {N_DECILES - 1}) // {N_DECILES} AS r
  FROM (SELECT count(*) AS n FROM c), range(1, {N_DECILES}) t(i)
), hist AS (
  SELECT cents, count(*) AS cnt FROM c GROUP BY cents
), cum AS (
  SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cc FROM hist
), b AS (
  SELECT list_sort(list(q)) AS qs
  FROM (SELECT i, min(cents) AS q
        FROM cum JOIN ranks ON cc >= r GROUP BY i)
)
SELECT decile, count(*) AS n_orders,
       min(cents) / 100.0 AS min_price,
       max(cents) / 100.0 AS max_price
FROM (
  SELECT cents,
         CAST(1 + len(list_filter(qs, q -> cents > q)) AS INTEGER)
           AS decile
  FROM c, b
)
GROUP BY decile
"""


ZO_BITS = 8  # bits per dimension in the z-value (2 dims → 16-bit z)
ZO_FILES = 256  # target file count: file = z >> ZO_BITS


def _interleave_terms(xe: str, ye: str, spark_div: bool) -> str:
    """Bit-interleave two ZO_BITS integers with pure +/div/% arithmetic —
    the one integer idiom both engines evaluate identically (no native
    bit-ops dependence). spark_div picks `div` vs DuckDB's `//`."""
    d = "div" if spark_div else "//"
    terms = []
    for i in range(ZO_BITS):
        terms.append(f"((({xe}) {d} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({ye}) {d} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout planning + its data-skipping report —
    the OPTIMIZE ZORDER BY pattern: interleave the bits of two filter
    dimensions (user bucket, value bucket), split the curve into
    ZO_FILES contiguous files, and report each file's per-dimension
    min/max envelope. Those envelopes ARE the skipping index: a filter on
    EITHER dimension prunes files whose envelope misses it, which only
    works because z-clustering keeps both spans narrow (~2^(ZO_BITS/2))
    simultaneously — the whole point of the curve vs single-column sort.
    The span columns make the clustering quality value-checkable.

    Everything is map-side integer arithmetic (the interleave is
    +/div/%-only, engine-portable) followed by ONE ZO_FILES-group
    aggregate; at 100 TB the same z-value feeds repartitionByRange for
    the actual rewrite, with identical math. [extension]"""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("user_id % 256").alias("x"),
        F.expr(
            "least(cast(round(value * 100, 0) as bigint) div 256, 255)"
        ).alias("y"),
    )
    z = F.expr(_interleave_terms("x", "y", spark_div=True))
    return (
        ev.select("x", "y", z.alias("z"))
        .groupBy(F.expr(f"z div {1 << ZO_BITS}").cast("int").alias("file_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
    )


QUERIES["zorder_file_stats"] = zorder_file_stats

ORACLE["zorder_file_stats"] = f"""
WITH ev AS (
  SELECT user_id % 256 AS x,
         least(CAST(round(value * 100) AS BIGINT) // 256, 255) AS y
  FROM events
), zed AS (
  SELECT x, y, {_interleave_terms("x", "y", spark_div=False)} AS z FROM ev
)
SELECT CAST(z // {1 << ZO_BITS} AS INTEGER) AS file_id,
       count(*) AS n_events,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max,
       max(x) - min(x) AS x_span,
       max(y) - min(y) AS y_span
FROM zed
GROUP BY 1
"""


# Benford expected first-digit shares, round(log10(1+1/d)·1e6) — fixed
# integer literals embedded in BOTH the query and the oracle, so the only
# transcendental lives in this comment, not in either engine.
BENFORD_MICRO = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153,
                 45757)


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fraud/data-quality screen for positive, scale-spanning amounts. Per
    leading digit: observed count, observed share (round-half-up micros via
    the integer-rational quantizer), the Benford expectation (fixed integer
    literals — no log10 in either engine), and the signed deviation in
    micro units. TPC-H-style uniform prices do NOT follow Benford — the
    audit's value is the exact deviation report, not a pass verdict.

    Scale shape: leading digit is map-side string arithmetic on integer
    cents; ONE 9-group aggregate; totals broadcast back onto the 9-row
    report. [extension]"""
    o = load_table(spark, sf_dir, "orders").select(F.expr(_CENTS).alias("cents"))
    digit = F.substring(F.col("cents").cast("string"), 1, 1).cast("int")
    counts = o.groupBy(digit.alias("digit")).agg(F.count("*").alias("n"))
    totals = counts.agg(F.sum("n").alias("t"))
    expected = F.element_at(
        F.array([F.lit(v) for v in BENFORD_MICRO]), F.col("digit")
    )
    share = F.expr("(2 * n * 1000000 + t) div (2 * t)")
    return counts.crossJoin(F.broadcast(totals)).select(
        "digit",
        "n",
        share.alias("share_micro"),
        expected.alias("benford_micro"),
        (share - expected).alias("dev_micro"),
    )


QUERIES["benford_digit_audit"] = benford_digit_audit

_BENFORD_CASE = " ".join(
    f"WHEN {d + 1} THEN {v}" for d, v in enumerate(BENFORD_MICRO)
)

ORACLE["benford_digit_audit"] = f"""
WITH c AS (
  SELECT CAST(substring(CAST({_CENTS} AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
), counts AS (
  SELECT digit, count(*) AS n FROM c GROUP BY digit
), totals AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
SELECT digit, n,
       (2 * n * 1000000 + t) // (2 * t) AS share_micro,
       CASE digit {_BENFORD_CASE} END AS benford_micro,
       (2 * n * 1000000 + t) // (2 * t) - (CASE digit {_BENFORD_CASE} END)
         AS dev_micro
FROM counts, totals
"""


WINSOR_LO_N = 2  # p = 2/128 and 126/128: dyadic tail probabilities, so the
WINSOR_HI_N = 126  # interpolated cut is exact binary64 (module docstring)


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) order-value statistics — the outlier-robust
    feature-prep step: clip at the exact p(2/128)/p(126/128) cents
    quantiles, then per order-priority report n, clip counts, and the
    winsorized mean in round-half-up micros. The tail probabilities are
    dyadic rationals, so the percentile interpolation lo+(hi−lo)·frac is
    exact binary64 in both engines (the exact_price_quantiles argument);
    the clipped values are integers, so the mean is the integer-rational
    quantizer over an exact sum.

    Scale shape: the two global cuts are ONE aggregate broadcast back; the
    clip is map-side; the report is one small-key aggregate — no sort, no
    fact-table join shuffle. [extension]"""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.expr(_CENTS).alias("cents")
    )
    lo_p, hi_p = WINSOR_LO_N / 128.0, WINSOR_HI_N / 128.0
    cuts = o.agg(
        F.percentile("cents", F.lit(lo_p)).alias("lo_cut"),
        F.percentile("cents", F.lit(hi_p)).alias("hi_cut"),
    )
    # cuts are exact dyadic binary64s; floor/ceil to integer cents so the
    # clipped column stays integer (sum stays exact past 2^53 via BIGINT)
    clipped = o.crossJoin(F.broadcast(cuts)).select(
        "o_orderpriority",
        "cents",
        F.expr("CAST(ceil(lo_cut) AS BIGINT)").alias("lo_i"),
        F.expr("CAST(floor(hi_cut) AS BIGINT)").alias("hi_i"),
    ).select(
        "o_orderpriority",
        F.expr("greatest(lo_i, least(hi_i, cents))").alias("w"),
        (F.col("cents") < F.col("lo_i")).cast("long").alias("clip_lo"),
        (F.col("cents") > F.col("hi_i")).cast("long").alias("clip_hi"),
    )
    g = clipped.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("clip_lo").alias("n_clip_lo"),
        F.sum("clip_hi").alias("n_clip_hi"),
        F.sum("w").alias("wsum"),
    )
    mean_micro = F.expr("(2 * wsum * 10000 + n_orders) div (2 * n_orders)")
    return g.select(
        "o_orderpriority",
        "n_orders",
        "n_clip_lo",
        "n_clip_hi",
        (mean_micro / F.lit(1_000_000.0)).alias("winsor_mean_price"),
    )


QUERIES["winsorized_stats"] = winsorized_stats

ORACLE["winsorized_stats"] = f"""
WITH c AS (
  SELECT o_orderpriority, {_CENTS} AS cents FROM orders
), cuts AS (
  SELECT CAST(ceil(quantile_cont(cents, {WINSOR_LO_N / 128.0!r})) AS BIGINT)
           AS lo_i,
         CAST(floor(quantile_cont(cents, {WINSOR_HI_N / 128.0!r})) AS BIGINT)
           AS hi_i
  FROM c
), clipped AS (
  SELECT o_orderpriority,
         greatest(lo_i, least(hi_i, cents)) AS w,
         CASE WHEN cents < lo_i THEN 1 ELSE 0 END AS clip_lo,
         CASE WHEN cents > hi_i THEN 1 ELSE 0 END AS clip_hi
  FROM c, cuts
)
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(clip_lo) AS BIGINT) AS n_clip_lo,
       CAST(sum(clip_hi) AS BIGINT) AS n_clip_hi,
       ((2 * CAST(sum(w) AS BIGINT) * 10000 + count(*))
         // (2 * count(*))) / 1000000.0 AS winsor_mean_price
FROM clipped
GROUP BY o_orderpriority
"""


KS_SRC_A = "src0"  # reference corpus slice
KS_SRC_B = "src1"  # comparison corpus slice


def ks_two_sample_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov distance between two sources'
    document-length distributions — the distribution-shift test run before
    mixing a new source into training data; the exact complement of
    data_drift_report's binned rates (KS needs no binning choice). The
    supremum |F_A − F_B| is computed over INTEGER cross-multiplied
    cumulatives (|cum_a·n_b − cum_b·n_a|), so the argmax and the distance
    are exact; one binary64 division quantizes the result to
    round-half-up micros. Output: one row with both sample sizes, the KS
    distance and the length where the gap peaks (ties → smallest).

    Scale shape: the fact table collapses map-side+one shuffle into a
    DOMAIN-sized (distinct lengths) table; the CDF window and argmax run
    on that small table (the single-partition window is over ≤ |domain|
    rows, not the corpus — the sort that would be illegal on the fact
    table is free here). [extension]"""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(KS_SRC_A, KS_SRC_B)
    )
    counts = docs.groupBy("n_chars").agg(
        F.sum((F.col("source") == KS_SRC_A).cast("long")).alias("ca"),
        F.sum((F.col("source") == KS_SRC_B).cast("long")).alias("cb"),
    )
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "n_chars",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = counts.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "n_chars",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("gap"),
    )
    dmax = gaps.groupBy("n_a", "n_b").agg(F.max("gap").alias("gmax"))
    at = (
        gaps.join(F.broadcast(dmax), ["n_a", "n_b"])
        .filter(F.col("gap") == F.col("gmax"))
        .groupBy("n_a", "n_b", "gmax")
        .agg(F.min("n_chars").alias("ks_at_length"))
    )
    return at.select(
        "n_a",
        "n_b",
        # nullif guard: on a degenerate slice (empty source) Spark (ANSI
        # off) would yield NULL while DuckDB raises division-by-zero —
        # the guard makes both engines emit NULL consistently
        F.expr(
            "(2 * gmax * 1000000 + n_a * n_b)"
            " div nullif(2 * n_a * n_b, 0)"
        ).alias("ks_micro"),
        "ks_at_length",
    )


QUERIES["ks_two_sample_lengths"] = ks_two_sample_lengths

ORACLE["ks_two_sample_lengths"] = f"""
WITH counts AS (
  SELECT n_chars,
         CAST(sum(CASE WHEN source = '{KS_SRC_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(sum(CASE WHEN source = '{KS_SRC_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM documents
  WHERE source IN ('{KS_SRC_A}', '{KS_SRC_B}')
  GROUP BY n_chars
), cum AS (
  SELECT n_chars,
         CAST(sum(ca) OVER (ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_a,
         CAST(sum(cb) OVER (ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_b
  FROM counts
), tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
  FROM counts
), gaps AS (
  SELECT n_chars, n_a, n_b, abs(cum_a * n_b - cum_b * n_a) AS gap
  FROM cum, tot
), dmax AS (SELECT n_a, n_b, max(gap) AS gmax FROM gaps GROUP BY n_a, n_b)
SELECT g.n_a, g.n_b,
       (2 * g.gmax * 1000000 + g.n_a * g.n_b)
         // nullif(2 * g.n_a * g.n_b, 0) AS ks_micro,
       min(x.n_chars) AS ks_at_length
FROM dmax g JOIN gaps x
  ON x.n_a = g.n_a AND x.n_b = g.n_b AND x.gap = g.gmax
GROUP BY g.n_a, g.n_b, g.gmax
"""


def _hex15_to_bigint_sql(h: str) -> str:
    """DuckDB-side parse of the first 15 hex chars of an md5 into a BIGINT
    (no strtol in DuckDB): per-digit positional expansion. 16^15 − 1 ≈
    1.15e18 < 2^63, so the value is always in BIGINT range — the exact
    twin of Spark's conv(substring(md5, 1, 15), 16, 10)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
        f" * {16 ** (15 - i)}"
        for i in range(1, 16)
    )


def table_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orderless per-month fingerprint of the orders table: row count +
    bit_xor of a 60-bit row hash (+ min/max hash as extra signal). The
    replication/migration validation primitive at 100 TB: two copies of a
    table match iff every (month, n_rows, checksum) row matches, computed
    with ONE linear scan + map-side partial aggregation and no sort —
    bit_xor is commutative/associative, so the result is independent of
    partitioning, task order, and row order. [extension]

    Cross-engine exactness: the row is serialized through types with
    canonical string forms in BOTH engines (BIGINT, VARCHAR, DECIMAL(15,2),
    DATE) — never raw doubles, whose string rendering is engine-specific —
    then md5'd, and the first 15 hex chars parsed to BIGINT (Spark conv vs
    the DuckDB positional expansion above)."""
    o = load_table(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    rowstr = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(15,2)").cast("string"),
        day.cast("string"),
        F.col("o_orderpriority"),
    )
    rowhash = F.conv(F.substring(F.md5(rowstr), 1, 15), 16, 10).cast("long")
    return (
        o.select(
            F.date_trunc("month", day).cast("date").alias("month"),
            rowhash.alias("rowhash"),
        )
        .groupBy("month")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(rowhash)").alias("checksum"),
            F.min("rowhash").alias("min_hash"),
            F.max("rowhash").alias("max_hash"),
        )
    )


QUERIES["table_fingerprint_orders"] = table_fingerprint_orders

ORACLE["table_fingerprint_orders"] = f"""
WITH r AS (
  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
           AS month,
         md5(concat_ws('|',
             CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
             o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR),
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
             o_orderpriority)) AS h
  FROM orders
), hh AS (
  SELECT month, {_hex15_to_bigint_sql('h')} AS rowhash FROM r
)
SELECT month, count(*) AS n_rows, bit_xor(rowhash) AS checksum,
       min(rowhash) AS min_hash, max(rowhash) AS max_hash
FROM hh GROUP BY month
"""


def weighted_median_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted (lower) median of l_extendedprice per
    return flag: the smallest price whose cumulative weight reaches half
    the group's total weight. [extension]

    Determinism: prices as integer CENTS, weights as integer quantities;
    the cumulative weight uses a RANGE frame ordered on cents, so tied
    prices accumulate as one block and the result is independent of tie
    order and partitioning. Both engines evaluate the identical
    2·cum ≥ W rule on exact integers; the final cents→currency divide is
    one shared-binary64 operation (playbook 3a). Scale shape: one hash
    exchange on the group key, sort within group for the window — the
    same cost as any exact order statistic (operators/stats.py header)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        # decimal(18,0) first: Spark's double→bigint cast truncates while
        # the DuckDB oracle's CAST rounds — the decimal hop rounds on both
        # engines (the repo's established exact-cast idiom, stats.py:85)
        F.col("l_quantity").cast("decimal(18,0)").cast("bigint").alias("w"),
    )
    grp = Window.partitionBy("l_returnflag")
    cum = (
        grp.orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        li.withColumn("cum_w", F.sum("w").over(cum))
        .withColumn("tot_w", F.sum("w").over(grp))
        .withColumn("n_rows", F.count("*").over(grp))
        .filter(F.col("cum_w") * 2 >= F.col("tot_w"))
        .groupBy("l_returnflag", "tot_w", "n_rows")
        .agg((F.min("cents") / 100.0).alias("weighted_median_price"))
        .select(
            "l_returnflag",
            F.col("tot_w").alias("total_weight"),
            "n_rows",
            "weighted_median_price",
        )
    )


QUERIES["weighted_median_prices"] = weighted_median_prices

ORACLE["weighted_median_prices"] = """
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), c AS (
  SELECT l_returnflag, cents, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_w,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot_w,
         count(*) OVER (PARTITION BY l_returnflag) AS n_rows
  FROM li
)
SELECT l_returnflag, CAST(tot_w AS BIGINT) AS total_weight, n_rows,
       min(cents) / 100.0 AS weighted_median_price
FROM c WHERE cum_w * 2 >= tot_w
GROUP BY l_returnflag, tot_w, n_rows
"""


def partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for the fact table — the report you run
    BEFORE deciding salting/AQE-skew-join settings for a 100 TB shuffle:
    for each candidate shuffle key of lineitem (suppkey, orderkey,
    partkey), the per-key row-count distribution that predicts reducer
    balance — key cardinality, max/total rows, the heaviest key, and
    max-over-mean skew in integer micro units (round-half-up of
    max·n_keys/total; a perfectly uniform key scores 10⁶).

    Shape: three hash aggregates over the same scan (one per key), each
    reduced to a 1-row summary before the union — the report itself is
    3 rows regardless of corpus size. Ties on max rows → lowest key id
    (min_by semantics pinned via packed min). [extension]"""
    li = load_table(spark, sf_dir, "lineitem")

    def profile(key: str) -> DataFrame:
        per_key = li.groupBy(key).agg(F.count("*").alias("cnt"))
        # heaviest key, ties → lowest id: min_by twin (cnt DESC, id ASC)
        # as a plain integer min over (MAXC − cnt)·R + id. Packing
        # bounds: per-key cnt < 10^7 and key id < 10^10 (both hold for
        # every TPC-H SF this runs at; widen MAXC/R together past that —
        # the product stays < 2^63 up to R = 9·10^11)
        packed = (F.lit(10_000_000) - F.col("cnt")) * F.lit(
            10_000_000_000
        ) + F.col(key).cast("long")
        return per_key.agg(
            F.lit(key).alias("join_key"),
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("max_rows"),
            F.min(packed).alias("p"),
        ).select(
            "join_key",
            "n_keys",
            "total_rows",
            "max_rows",
            F.expr("p % 10000000000").alias("heaviest_key"),
            F.expr(
                "(2 * max_rows * n_keys * 1000000 + total_rows)"
                " DIV (2 * total_rows)"
            ).alias("skew_micro"),
        )

    return (
        profile("l_suppkey")
        .unionByName(profile("l_orderkey"))
        .unionByName(profile("l_partkey"))
    )


QUERIES["partition_skew_report"] = partition_skew_report

_SKEW_ONE_SQL = """
SELECT '{key}' AS join_key,
       count(*) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS total_rows,
       max(cnt) AS max_rows,
       CAST(min((10000000 - cnt) * 10000000000 + {key}) % 10000000000
            AS BIGINT) AS heaviest_key,
       (2 * max(cnt) * count(*) * 1000000 + CAST(sum(cnt) AS BIGINT))
         // (2 * CAST(sum(cnt) AS BIGINT)) AS skew_micro
FROM (SELECT {key}, count(*) AS cnt FROM lineitem GROUP BY {key})
"""

ORACLE["partition_skew_report"] = " UNION ALL ".join(
    _SKEW_ONE_SQL.format(key=k)
    for k in ("l_suppkey", "l_orderkey", "l_partkey")
)


def gini_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer order values — the
    inequality metric a marketplace tracks per region. Exact integer
    form of the rank formula G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over
    cents sorted ascending (ties broken by o_orderkey — with equal
    values the Σ i·x₍ᵢ₎ total is tie-order-invariant). Both the
    numerator 2·S1 − (n+1)·S0 and the denominator n·S0 are exact
    BIGINTs < 2^53 (per nation at sf0.1: n·S0 ≈ 5·10¹⁴; micro-scaling
    them would overflow 2^63, so the coefficient ships as ONE shared
    binary64 division of the two exactly-representable integers — the
    vwap idiom, bit-identical on both engines).

    Shape: one hashpartitioning(nation) exchange feeds the rank window
    and the closing aggregate. [extension]"""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    j = o.join(c, "o_custkey").select("c_nationkey", "o_orderkey", "cents")
    w = Window.partitionBy("c_nationkey").orderBy("cents", "o_orderkey")
    ranked = j.withColumn("rn", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("total_cents"),
            F.sum(F.col("rn") * F.col("cents")).alias("s1"),
        )
        .select(
            "c_nationkey",
            "n_orders",
            "total_cents",
            F.expr(
                "CAST(2 * s1 - (n_orders + 1) * total_cents AS DOUBLE)"
                " / CAST(n_orders * total_cents AS DOUBLE)"
            ).alias("gini"),
        )
    )


QUERIES["gini_order_values"] = gini_order_values

ORACLE["gini_order_values"] = """
WITH j AS (
  SELECT c.c_nationkey, o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), ranked AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cents, o_orderkey) AS rn
  FROM j
)
SELECT c_nationkey,
       count(*) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(2 * CAST(sum(rn * cents) AS BIGINT)
            - (count(*) + 1) * CAST(sum(cents) AS BIGINT) AS DOUBLE)
         / CAST(count(*) * CAST(sum(cents) AS BIGINT) AS DOUBLE) AS gini
FROM ranked GROUP BY c_nationkey
"""


def lorenz_decile_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve behind gini_order_values: per nation, the share
    of total order value held by the bottom d/10 of orders (value asc,
    o_orderkey tiebreak), d = 1..10, in round-half-up micros — the
    concentration curve a marketplace plots next to the Gini scalar.
    All-BIGINT: decile cut = rank ≤ (d·n) div 10 (exact), cumulative
    cents ≤ total ≈ 10¹¹ per nation so the 2·cum·10⁶ scaling stays well
    under 2^63.

    Shape: the same single hashpartitioning(nation) exchange as the
    Gini — rank window + ONE conditional aggregation emitting all ten
    arms, then a 10-way union of the per-nation row. [extension]"""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    j = o.join(c, "o_custkey").select("c_nationkey", "o_orderkey", "cents")
    w = Window.partitionBy("c_nationkey").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("c_nationkey")
    ranked = j.withColumn("rn", F.row_number().over(w).cast("long")).withColumn(
        "n", F.count("*").over(wn).cast("long")
    )
    per_nation = ranked.groupBy("c_nationkey").agg(
        F.max("n").alias("n_orders"),
        F.sum("cents").alias("total_cents"),
        *[
            F.sum(
                F.when(
                    F.col("rn") <= F.expr(f"({d} * n) DIV 10"),
                    F.col("cents"),
                ).otherwise(F.lit(0))
            ).alias(f"cum_{d}")
            for d in range(1, 11)
        ],
    )
    arms = [
        per_nation.select(
            "c_nationkey",
            F.lit(d).alias("decile"),
            F.col(f"cum_{d}").alias("cum_cents"),
            F.expr(
                f"(2 * cum_{d} * 1000000 + total_cents)"
                " DIV (2 * total_cents)"
            ).alias("share_micro"),
        )
        for d in range(1, 11)
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


QUERIES["lorenz_decile_shares"] = lorenz_decile_shares

_LORENZ_ARM_SQL = """
SELECT c_nationkey, {d} AS decile, cum_{d} AS cum_cents,
       (2 * cum_{d} * 1000000 + total_cents) // (2 * total_cents)
         AS share_micro
FROM lorenz_pn
"""

ORACLE["lorenz_decile_shares"] = f"""
WITH lorenz_j AS (
  SELECT c.c_nationkey, o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), lorenz_r AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cents, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM lorenz_j
), lorenz_pn AS (
  SELECT c_nationkey,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         {", ".join(
             f"CAST(sum(CASE WHEN rn <= ({d} * n) // 10 THEN cents"
             f" ELSE 0 END) AS BIGINT) AS cum_{d}" for d in range(1, 11))}
  FROM lorenz_r GROUP BY c_nationkey
)
{" UNION ALL ".join(_LORENZ_ARM_SQL.format(d=d) for d in range(1, 11))}
"""
