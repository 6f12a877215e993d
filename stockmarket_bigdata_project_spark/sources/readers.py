"""Source readers (SURVEY §2.1): CSV with explicit schema + malformed-row
handling, JSON payload decode, column-coalescing normalization.

Reference parity cites (into /root/reference):
  S3 JSON payload decode      spark_consumer.py:75; reddit_pipeline.py:93-95 —
     every Kafka value is from_json(value, schema); malformed → null → drop
  S4 CSV file scan            split_data.py:29-30; producer_training_data.py:53
  S5 CSV dialect tolerance    relayer_simulator.py:96-115,138-182 — sniffer +
     per-row error skip → spark.read.csv(mode=DROPMALFORMED)
  §1.3 column coalescing      producer_training_data.py:84-91 — body/selftext,
     num_comments/comms_num dataset-variant aliasing

Each query materializes a deterministic raw file from the testdata (playing
the role of the reference's downloaded CSVs / Kafka topic bytes), then reads
it back through the production reader path — so the full parse pipeline is
oracle-checked, not just the happy-path parquet scan.

Scale notes (100 TB): CSV/JSON scans are splittable (uncompressed / bzip2),
schema is declared not inferred (inference reads the data twice), and
malformed handling is DROPMALFORMED at the scan — no driver-side row loop.
"""

from __future__ import annotations

import os
import tempfile
import threading

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table

_staged: dict[tuple[str, str], str] = {}
_lock = threading.Lock()

EVENTS_CSV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_iso", StringType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _stage(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Write the raw-file fixture for `kind` once per (sf_dir, kind)."""
    with _lock:
        key = (sf_dir, kind)
        if key in _staged:
            return _staged[key]
        out = tempfile.mkdtemp(prefix=f"spark_graft_{kind}_")
        ev = load_table(spark, sf_dir, "events")
        if kind == "csv":
            # ISO-8601 microsecond text keeps the timestamp roundtrip exact
            ev.select(
                "event_id",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_iso"),
                "user_id",
                "event_type",
                "value",
            ).write.mode("overwrite").option("header", True).csv(out)
        elif kind == "csv_dirty":
            # corrupt every 10th row: truncated line (wrong arity) — the
            # DROPMALFORMED fixture. Built with text concat so the corruption
            # is byte-level, like the reference's broken CSV rows.
            clean = ev.select(
                F.concat_ws(
                    ",",
                    "event_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                    "user_id",
                    "event_type",
                    F.col("value").cast("string"),
                ).alias("line"),
                "event_id",
            )
            dirty = clean.select(
                F.when(
                    F.col("event_id") % 10 == 0, F.concat_ws(",", F.lit("garbage"))
                )
                .otherwise(F.col("line"))
                .alias("value")
            )
            dirty.write.mode("overwrite").text(out)
        elif kind == "json":
            # the Kafka topic fixture: each row one JSON document (the
            # producer's json.dumps, producer_training_data.py:22)
            ev.select(
                F.to_json(
                    F.struct("event_id", "ts", "user_id", "event_type", "value"),
                    # default format truncates to milliseconds; keep micros
                    {"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
                ).alias("value")
            ).write.mode("overwrite").text(out)
        elif kind == "orc":
            # Spark's other first-class columnar format: same pushdown/pruning
            # machinery as parquet (predicate pushdown via ORC row-group
            # stats), exercised as a write->scan roundtrip
            ev.select("event_id", "ts", "user_id", "event_type", "value").write.mode(
                "overwrite"
            ).orc(out)
        elif kind == "xml":
            # Spark 4 ships XML as a first-class source (no external jar).
            # Timestamp travels as ISO-micros text, like the CSV fixture,
            # so the roundtrip is exact.
            ev.select(
                "event_id",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                    "ts_iso"
                ),
                "user_id",
                "event_type",
                "value",
            ).write.mode("overwrite").format("xml").option(
                "rootTag", "events"
            ).option("rowTag", "event").save(out)
        elif kind == "jsonl":
            # the training-data interchange format: one JSON document per
            # line over the documents table — strings with embedded
            # newlines/quotes travel as JSON escapes, so the roundtrip is
            # exact without a text-sanitization pass
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "text", "lang", "source", "n_chars"
            ).write.mode("overwrite").json(out)
        else:
            raise ValueError(kind)
        _staged[key] = out
        return out


# --- S4: CSV scan with explicit schema --------------------------------------
def csv_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV roundtrip through the declared-schema reader (no inference pass)."""
    path = _stage(spark, sf_dir, "csv")
    return (
        spark.read.schema(EVENTS_CSV_SCHEMA)
        .option("header", True)
        .csv(path)
        .select(
            "event_id",
            F.to_timestamp("ts_iso").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )


# --- S5: malformed-row tolerance ---------------------------------------------
def csv_scan_dropmalformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headerless dirty CSV with every (event_id % 10 == 0) row corrupted;
    DROPMALFORMED at the scan discards them — the set-based version of the
    reference's per-row try/except skip (relayer_simulator.py:138-182)."""
    path = _stage(spark, sf_dir, "csv_dirty")
    return (
        spark.read.schema(EVENTS_CSV_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .csv(path)
        .select("event_id", "user_id", "event_type", "value")
        # a corrupted 1-field line still parses: first field null, rest null;
        # DROPMALFORMED only rejects rows that fail type conversion, so the
        # residual all-null rows are filtered like the reference's
        # dropna-after-parse (spark_consumer.py:82)
        .filter(F.col("event_id").isNotNull())
    )


# --- S3: JSON payload decode -------------------------------------------------
def json_payload_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json(value, schema) over a JSON-lines 'topic' — the exact decode
    the reference applies to every Kafka message, including the
    malformed→null→drop convention."""
    path = _stage(spark, sf_dir, "json")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", StringType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    return (
        spark.read.text(path)
        .select(F.from_json(F.col("value"), schema).alias("d"))
        .select("d.*")
        .filter(F.col("event_id").isNotNull())
        .select(
            "event_id",
            F.to_timestamp("ts").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )


# --- §1.3: column-coalescing normalizer --------------------------------------
def normalize_variant_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-variant tolerance: the reference's reddit CSVs carry either
    `body` or `selftext`, `num_comments` or `comms_num`; the normalizer
    coalesces whichever is present. Simulated by splitting events into two
    variants and normalizing the union."""
    ev = load_table(spark, sf_dir, "events")
    v1 = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id",
        F.col("event_type").alias("type_a"),
        F.lit(None).cast("string").alias("type_b"),
        "value",
    )
    v2 = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        F.lit(None).cast("string").alias("type_a"),
        F.col("event_type").alias("type_b"),
        "value",
    )
    return v1.unionByName(v2).select(
        "event_id",
        F.coalesce("type_a", "type_b").alias("event_type"),
        "value",
    )


# --- [extension] ORC scan ----------------------------------------------------
def orc_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write -> scan roundtrip. The timestamp survives at microsecond
    precision (ORC stores micros), matching the engine's events semantics."""
    path = _stage(spark, sf_dir, "orc")
    return spark.read.orc(path)


# --- [extension] XML scan (built-in source since Spark 4) --------------------
def xml_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML write -> scan roundtrip through the native rowTag reader with a
    declared schema (no inference pass): the document-feed ingest shape for
    XML payloads, same declarative pipeline as CSV/JSON."""
    path = _stage(spark, sf_dir, "xml")
    return (
        spark.read.format("xml")
        .option("rowTag", "event")
        .schema(EVENTS_CSV_SCHEMA)
        .load(path)
        .select(
            "event_id",
            F.to_timestamp("ts_iso").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )


# --- [extension] JSONL corpus scan -------------------------------------------
def jsonl_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL (one JSON doc per line) write → scan roundtrip over the
    documents corpus with a DECLARED schema — no sampling inference pass,
    which at 100 TB would cost a full extra read before the first real one.
    JSONL is the de-facto training-data interchange format; this pins that
    an exported corpus re-ingests byte-identically (text with newlines,
    quotes, unicode travels as JSON escapes)."""
    path = _stage(spark, sf_dir, "jsonl")
    return (
        spark.read.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .json(path)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


# --- [extension] schema evolution on read ------------------------------------
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mergeSchema scan across parquet batches written under DIFFERENT
    schemas — the long-lived-table reality: a column (`score`) added
    mid-stream. Old batches surface it as NULL, new batches carry values;
    the merged schema is the union. At 100 TB this is how a table absorbs
    producer upgrades without a rewrite (footer-schema merge at planning,
    no data pass).

    Batches are split on event_id parity so the oracle can recompute which
    rows carry the evolved column."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="spark_graft_evo_")
    old_batch = ev.filter(F.col("event_id") % 2 == 0)
    new_batch = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "score", F.expr("CAST(round(value * 100) AS BIGINT) % 97")
    )
    with _lock:
        old_batch.write.mode("overwrite").parquet(os.path.join(root, "b0"))
        new_batch.write.mode("overwrite").parquet(os.path.join(root, "b1"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "b0"), os.path.join(root, "b1")
    )
    return back.select("event_id", "user_id", "event_type", "value", "score")


QUERIES = {
    "jsonl_scan_roundtrip": jsonl_scan_roundtrip,
    "orc_scan_roundtrip": orc_scan_roundtrip,
    "xml_scan_roundtrip": xml_scan_roundtrip,
    "schema_evolution_read": schema_evolution_read,
    "csv_scan_events": csv_scan_events,
    "csv_scan_dropmalformed": csv_scan_dropmalformed,
    "json_payload_decode": json_payload_decode,
    "normalize_variant_columns": normalize_variant_columns,
}

ORACLE = {
    "jsonl_scan_roundtrip": """
SELECT doc_id, text, lang, source, n_chars FROM documents
""",
    "orc_scan_roundtrip": """
SELECT event_id, ts, user_id, event_type, value FROM events
""",
    "xml_scan_roundtrip": """
SELECT event_id, ts, user_id, event_type, value FROM events
""",
    "schema_evolution_read": """
SELECT event_id, user_id, event_type, value,
       CASE WHEN event_id % 2 = 1
            THEN CAST(round(value * 100) AS BIGINT) % 97
            ELSE NULL END AS score
FROM events
""",
    "csv_scan_events": """
SELECT event_id, ts, user_id, event_type, value FROM events
""",
    "csv_scan_dropmalformed": """
SELECT event_id, user_id, event_type, value FROM events
WHERE event_id % 10 <> 0
""",
    "json_payload_decode": """
SELECT event_id, ts, user_id, event_type, value FROM events
""",
    "normalize_variant_columns": """
SELECT event_id, event_type, value FROM events
""",
}
