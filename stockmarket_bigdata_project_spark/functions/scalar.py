"""Scalar function surface: string / datetime / math / conditional / JSON /
cast semantics (SURVEY §2.8).

Everything is a built-in Catalyst expression — whole-stage codegen, no Python.
The reference's only scalar UDF (ticker extraction) is replaced by native
regexp expressions in functions/text.py.

Reference parity cites (into /root/reference):
  string     spark_consumer.py:35-38 (upper/concat), stock_pipeline.py:184
  datetime   spark_consumer.py:78,100-101; stock_pipeline.py:87,159-164;
             producer_training_data.py:32-44 (unix-seconds normalize)
  math       reddit_pipeline.py:184,187 (round); stock_pipeline.py:233-237
             (pct-error); app.py:411-415 (abs/sign); 06_..ipynb cell 11
             (greatest(0.5, 1-|err|) confidence)
  condition  predictor_service.py:67-85 (threshold rule chain → when/otherwise)
  JSON       spark_consumer.py:75 (from_json); producer side json.dumps
  cast       app.py:82-84 (pd.to_numeric errors=coerce → try_cast)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.concat_ws(" ", "c_name", "c_mktsegment").alias("name_seg"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
    )


def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.date_add(d, 30).alias("due_date"),
        F.date_sub(d, 7).alias("week_before"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).alias("days_to_1999"),
        F.unix_timestamp(d.cast("timestamp")).alias("epoch_s"),
    )


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        # genuine reals quantized via floor(x·10^6 + 0.5)/10^6 — pure IEEE
        # ops identical on both engines, unlike round()'s algorithm
        # (playbook rule 2; sqrt is correctly rounded on both, ln's 1-ulp
        # libm delta is absorbed by the quantization off half boundaries)
        (F.floor(F.sqrt("l_quantity") * 1e6 + F.lit(0.5)).cast("double")
         / 1e6).alias("qty_sqrt"),
        (F.floor(F.log("l_extendedprice") * 1e6 + F.lit(0.5)).cast("double")
         / 1e6).alias("price_ln"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        F.greatest(F.lit(0.5), F.round(1 - F.col("l_discount"), 2)).alias("conf"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("min_rate"),
    )


def conditional_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The predictor's rule dispatch (momentum / mean-reversion / random-walk,
    predictor_service.py:67-85) as a pure when/otherwise expression over the
    gold analog columns."""
    from ..operators.gold import gold_daily_features

    g = gold_daily_features(spark, sf_dir)
    rule = (
        F.when(
            (F.col("order_count") > 5) & (F.col("close_px") > 1000), "momentum"
        )
        .when(F.col("order_count") > 5, "mean_reversion")
        .otherwise("random_walk")
    )
    predicted = (
        F.when(rule == "momentum", F.round(F.col("close_px") * 1.02, 4))
        .when(rule == "mean_reversion", F.round(F.col("close_px") * 0.99, 4))
        .otherwise(F.col("close_px"))
    )
    return g.select(
        "l_suppkey",
        "trade_date",
        "close_px",
        rule.alias("rule"),
        predicted.alias("predicted_close"),
    )


def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json/get_json_object over the events.props JSON payload —
    the Kafka-payload decode surface (S3) against parquet-held JSON."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        parsed.getField("k").alias("k_schema"),
    )


def xml_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_xml roundtrip: serialize each event to an XML fragment
    (integer cents — never a float through a string format, which engines
    render differently), parse it back with a declared schema, aggregate the
    PARSED fields. The oracle recomputes from the raw columns, so a parser
    discrepancy cannot hide. [extension — the reference has no XML, but the
    decode-a-payload-column surface (S3) is format-agnostic.]"""
    ev = load_table(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<e><t>"),
        F.col("event_type"),
        F.lit("</t><c>"),
        F.expr("CAST(round(value * 100) AS BIGINT)").cast("string"),
        F.lit("</c></e>"),
    )
    parsed = F.from_xml(xml, "t STRING, c BIGINT").alias("d")
    return (
        ev.select(parsed)
        .groupBy(F.col("d.t").alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            (F.sum("d.c") / 100.0).alias("total_value"),
        )
    )


def cast_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").cast("string").alias("id_str"),
        F.col("value").cast("int").alias("value_int"),
        F.expr("try_cast(event_type AS int)").alias("bad_cast_null"),
        F.expr("try_cast(get_json_object(props, '$.k') AS int)").alias("k_coerced"),
    )


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface [extension — the reference's closest is its implicit
    JSON documents, §1.2]: JSON payload → map<string,bigint> via from_json,
    exploded to (key, value) rows with map_keys/element_at exercised in the
    same projection, then aggregated per key. Map-side: the explode fans out
    ≤|keys| rows per event inside the scan stage; the only shuffle is the
    tiny per-key aggregate."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    kv = ev.select(
        F.explode(m).alias("k", "v"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_direct"),
    )
    return kv.groupBy("k").agg(
        F.count("*").alias("n_events"),
        F.sum("v").alias("total_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.sum("n_keys").alias("total_keys"),
        F.sum(F.coalesce("k_direct", F.lit(0))).alias("total_k_direct"),
    )


def variant_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: parse_json → semi-structured VARIANT column
    → typed extraction with variant_get / schema discovery via
    schema_of_variant — the open-schema ingestion path that replaces
    rigid from_json structs when payloads drift. The oracle is DuckDB's
    JSON extraction over the same payloads (VARIANT itself can't cross
    engines, so the CHECKED surface is the extracted typed values)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_int"),
        F.expr("variant_get(parse_json(props), '$.k', 'string')").alias(
            "k_str"
        ),
        F.expr(
            "try_variant_get(parse_json(props), '$.missing', 'int') IS NULL"
        ).alias("missing_is_null"),
    )


def sql_udf_order_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDF surface (CREATE FUNCTION ... RETURN expr): the
    order-value tiering rule defined ONCE as a catalog function and reused
    by name — the governed-metric-definition pattern (one place to change a
    business rule, every query picks it up). SQL UDFs inline into the
    Catalyst plan at analysis time, so unlike Python UDFs they cost nothing:
    whole-stage codegen sees the CASE expression itself. Oracle inlines the
    identical CASE — which is exactly what Spark executes."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION order_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p >= 300000 THEN 'jumbo'
                    WHEN p >= 150000 THEN 'large'
                    WHEN p >= 50000 THEN 'mid'
                    ELSE 'small' END
        """
    )
    return spark.sql(
        """
        SELECT order_tier(o_totalprice) AS tier,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                 AS tier_value
        FROM orders_v GROUP BY 1
        """
    )


def collated_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string-collation surface: distinct counts under binary vs
    UTF8_LCASE collation over a deterministically case-perturbed event_type
    (odd event_ids uppercased, so the corpus genuinely mixes case). Under
    the case-insensitive collation the perturbation collapses back to the
    original cardinality; under binary it doubles. Collation is a
    compare-time property — no extra pass, the same hash aggregate runs
    with a different equality. Oracle models UTF8_LCASE as lower()."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(
            F.col("event_id") % 2 == 1, F.upper("event_type")
        ).otherwise(F.col("event_type")).alias("et")
    )
    return mixed.select(
        F.count_distinct(F.col("et")).alias("n_binary"),
        F.count_distinct(F.expr("collate(et, 'UTF8_LCASE')")).alias(
            "n_case_insensitive"
        ),
    )


QUERIES = {
    "sql_udf_order_tiers": sql_udf_order_tiers,
    "collated_distinct_counts": collated_distinct_counts,
    "string_functions": string_functions,
    "map_functions": map_functions,
    "datetime_functions": datetime_functions,
    "math_functions": math_functions,
    "conditional_rules": conditional_rules,
    "json_functions": json_functions,
    "xml_functions": xml_functions,
    "cast_functions": cast_functions,
    "variant_functions": variant_functions,
}

_GOLD_FOR_RULES = """
WITH base AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS trade_date,
         l_extendedprice, l_quantity, l_orderkey, l_linenumber, l_shipdate
  FROM lineitem
), win AS (
  SELECT l_suppkey, trade_date, l_extendedprice,
         first_value(l_extendedprice) OVER w AS open_px,
         last_value(l_extendedprice) OVER (
            PARTITION BY l_suppkey, trade_date
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_px
  FROM base
  WINDOW w AS (PARTITION BY l_suppkey, trade_date
               ORDER BY l_shipdate, l_orderkey, l_linenumber)
), stock AS (
  SELECT l_suppkey, trade_date, max(close_px) AS close_px
  FROM win GROUP BY l_suppkey, trade_date
), activity AS (
  SELECT CAST(o_orderdate AS DATE) AS trade_date, count(*) AS order_count
  FROM orders GROUP BY 1
)
SELECT s.l_suppkey, s.trade_date, s.close_px,
       coalesce(a.order_count, 0) AS order_count
FROM stock s LEFT JOIN activity a USING (trade_date)
"""

ORACLE = {
    "sql_udf_order_tiers": """
SELECT CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
            WHEN o_totalprice >= 150000 THEN 'large'
            WHEN o_totalprice >= 50000 THEN 'mid'
            ELSE 'small' END AS tier,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS tier_value
FROM orders GROUP BY 1
""",
    "collated_distinct_counts": """
WITH mixed AS (
  SELECT CASE WHEN event_id % 2 = 1 THEN upper(event_type)
              ELSE event_type END AS et
  FROM events
)
SELECT count(DISTINCT et) AS n_binary,
       count(DISTINCT lower(et)) AS n_case_insensitive
FROM mixed
""",
    "string_functions": """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lower(c_mktsegment) AS segment_lower,
       concat_ws(' ', c_name, c_mktsegment) AS name_seg,
       length(c_name) AS name_len,
       substring(c_name, 1, 8) AS name_prefix,
       trim('  pad  ') AS trimmed,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked
FROM customer
""",
    "datetime_functions": """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       CAST(o_orderdate AS DATE) - 7 AS week_before,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER)
         AS days_to_1999,
       CAST(epoch(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) AS BIGINT) AS epoch_s
FROM orders
""",
    "math_functions": """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 0) AS price_round,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       floor(sqrt(l_quantity) * 1000000.0 + 0.5) / 1000000.0 AS qty_sqrt,
       floor(ln(l_extendedprice) * 1000000.0 + 0.5) / 1000000.0 AS price_ln,
       round(pow(l_quantity, 2), 2) AS qty_sq,
       greatest(0.5, round(1 - l_discount, 2)) AS conf,
       least(l_tax, l_discount) AS min_rate
FROM lineitem
""",
    "conditional_rules": f"""
WITH gold AS ({_GOLD_FOR_RULES})
SELECT l_suppkey, trade_date, close_px,
       CASE WHEN order_count > 5 AND close_px > 1000 THEN 'momentum'
            WHEN order_count > 5 THEN 'mean_reversion'
            ELSE 'random_walk' END AS rule,
       CASE WHEN order_count > 5 AND close_px > 1000 THEN round(close_px * 1.02, 4)
            WHEN order_count > 5 THEN round(close_px * 0.99, 4)
            ELSE close_px END AS predicted_close
FROM gold
""",
    "json_functions": """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_schema
FROM events
""",
    "map_functions": """
WITH kv AS (
  SELECT unnest(json_keys(props::JSON)) AS k,
         len(json_keys(props::JSON)) AS n_keys,
         props
  FROM events
), typed AS (
  SELECT k, n_keys,
         CAST(json_extract(props::JSON, '$.' || k) AS BIGINT) AS v,
         CAST(json_extract(props::JSON, '$.k') AS BIGINT) AS k_direct
  FROM kv
)
SELECT k, count(*) AS n_events, CAST(sum(v) AS BIGINT) AS total_v,
       min(v) AS min_v, max(v) AS max_v,
       CAST(sum(n_keys) AS BIGINT) AS total_keys,
       CAST(sum(coalesce(k_direct, 0)) AS BIGINT) AS total_k_direct
FROM typed GROUP BY k
""",
    "xml_functions": """
SELECT event_type, count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events GROUP BY event_type
""",
    "cast_functions": """
SELECT event_id,
       CAST(event_id AS VARCHAR) AS id_str,
       CAST(trunc(value) AS INTEGER) AS value_int,  -- Spark casts truncate; DuckDB rounds
       TRY_CAST(event_type AS INTEGER) AS bad_cast_null,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_coerced
FROM events
""",
}

ORACLE["variant_functions"] = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       json_extract_string(props, '$.k') AS k_str,
       json_extract_string(props, '$.missing') IS NULL AS missing_is_null
FROM events
"""


def try_arithmetic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface (the ANSI-mode companion API):
    try_divide / try_add / try_multiply / try_element_at return NULL
    where strict evaluation would raise (division by zero, BIGINT
    overflow, invalid array index) — the functions a pipeline uses to
    keep one poisoned row from killing a 100 TB job. Each NULL case is
    made deterministic per row so the surface is value-checkable: the
    DuckDB oracle (no TRY() in 1.0) encodes the identical semantics as
    CASE guards, which doubles as documentation of exactly when each
    function nulls. The non-null division is int→double exact + one
    shared IEEE division. Pure map-side projection. [extension]"""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr(
            "try_divide(CAST(round(o_totalprice * 100) AS BIGINT),"
            " pmod(o_custkey, 5))"
        ).alias("div_or_null"),
        F.expr("try_add(9223372036854775807, o_orderkey)").alias("add_ovf"),
        F.expr("try_multiply(o_orderkey, CAST(4611686018427387904 AS BIGINT))").alias(
            "mul_ovf"
        ),
        # index runs 1..5: 4/5 are the caught out-of-bounds NULL case
        # (index 0 is rejected even by try_element_at — INVALID_INDEX_OF_ZERO
        # is an always-invalid argument, not a runtime error it suppresses)
        F.expr(
            "try_element_at(array('a','b','c'),"
            " CAST(1 + pmod(o_orderkey, 5) AS INT))"
        ).alias("elem_or_null"),
    )


QUERIES["try_arithmetic_functions"] = try_arithmetic_functions

ORACLE["try_arithmetic_functions"] = """
SELECT o_orderkey,
       CASE WHEN o_custkey % 5 = 0 THEN NULL
            ELSE CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                 / (o_custkey % 5) END AS div_or_null,
       CASE WHEN o_orderkey > 0 THEN NULL
            ELSE 9223372036854775807 END AS add_ovf,
       CASE WHEN o_orderkey > 1 THEN NULL
            ELSE o_orderkey * 4611686018427387904 END AS mul_ovf,
       CASE WHEN o_orderkey % 5 <= 2
            THEN (['a','b','c'])[CAST(1 + o_orderkey % 5 AS INTEGER)]
            ELSE NULL END AS elem_or_null
FROM orders
"""
