"""Kafka builders are plan-construction-only in this container (no broker,
no connector JAR): verify option wiring and the decode contract against a
local JSON fixture instead of a topic."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from stockmarket_bigdata_project_spark.sources.kafka import (
    DEFAULTS,
    kafka_sink,
    kafka_stream_options,
    kafka_stream_reader,
)


def test_stream_reader_options(spark):
    opts = kafka_stream_options("broker:9092", "events")
    assert opts["subscribe"] == "events"
    assert opts["maxOffsetsPerTrigger"] == "10000"
    for k, v in DEFAULTS.items():
        assert opts[k] == v
    schema = StructType([StructField("x", LongType())])
    reader, _ = kafka_stream_reader(spark, "broker:9092", "events", schema)
    assert reader is not None  # configured, never load()ed (no broker)


def test_decode_matches_reference_convention(spark):
    """decode == from_json(value.cast string, schema).select(d.*) — applied
    to a local frame shaped like Kafka output (value binary)."""
    schema = StructType(
        [StructField("x", LongType()), StructField("s", StringType())]
    )
    raw = spark.createDataFrame(
        [(bytearray(b'{"x": 7, "s": "ok"}'),), (bytearray(b"not json"),)],
        "value binary",
    )
    _, decode = kafka_stream_reader(spark, "b:9092", "t", schema)
    rows = decode(raw).collect()
    assert ({(r.x, r.s) for r in rows}) == {(7, "ok"), (None, None)}


def test_sink_payload_convention(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    writer = kafka_sink(df, "b:9092", "out", key_col="id")
    # the writer is configured but never started (no broker); check the
    # payload projection feeding it instead
    payload = df.select(
        F.col("id").cast("string").alias("key"),
        F.to_json(F.struct("id", "name")).alias("value"),
    ).first()
    assert payload.key == "1" and '"name":"a"' in payload.value
    assert writer is not None


# --- broker-backed smoke (gated: runs only where a real broker exists) -------
import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BROKER"),
    reason="no Kafka broker in this environment "
    "(set SPARK_GRAFT_KAFKA_BROKER=host:port to enable)",
)
def test_kafka_roundtrip_against_real_broker(spark):
    """Integration smoke for the S1/S13 builders: produce 10 JSON rows
    through kafka_sink, read them back with kafka_batch_reader + the S3
    decode, and assert value-for-value identity. Keeps the builders'
    correctness EXECUTED (not just asserted) wherever infra exists;
    skipped-clean in the sandbox, which ships no broker or connector JAR."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from stockmarket_bigdata_project_spark.sources.kafka import (
        kafka_batch_reader, kafka_sink,
    )

    broker = os.environ["SPARK_GRAFT_KAFKA_BROKER"]
    topic = os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", "spark_graft_smoke")
    src = spark.range(10).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("payload")
    )
    kafka_sink(src, broker, topic, key_col="id").save()

    schema = StructType(
        [StructField("id", LongType()), StructField("payload", StringType())]
    )
    raw = kafka_batch_reader(spark, broker, topic).load()
    decoded = raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("d")
    ).select("d.*")
    rows = {(r.id, r.payload) for r in decoded.collect()}
    assert {(i, f"v{i}") for i in range(10)} <= rows


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BROKER"),
    reason="no Kafka broker in this environment "
    "(set SPARK_GRAFT_KAFKA_BROKER=host:port to enable)",
)
def test_kafka_streaming_scan_against_real_broker(spark, tmp_path):
    """Integration smoke for the S2 builder (the one leg the batch
    round-trip above does not execute): produce through kafka_sink, then
    drain the topic with kafka_stream_reader + decode via an availableNow
    run into a memory sink — the exact reader the reference's
    reddit_pipeline runs continuously. Skipped-clean in the sandbox."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from stockmarket_bigdata_project_spark.sources.kafka import (
        kafka_sink, kafka_stream_reader,
    )

    broker = os.environ["SPARK_GRAFT_KAFKA_BROKER"]
    topic = os.environ.get(
        "SPARK_GRAFT_KAFKA_STREAM_TOPIC", "spark_graft_stream_smoke"
    )
    src = spark.range(10).select(
        F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("payload")
    )
    kafka_sink(src, broker, topic, key_col="id").save()

    schema = StructType(
        [StructField("id", LongType()), StructField("payload", StringType())]
    )
    reader, decode = kafka_stream_reader(spark, broker, topic, schema)
    q = (
        decode(reader.load())
        .writeStream.format("memory")
        .queryName("kafka_s2_smoke")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.id, r.payload)
        for r in spark.table("kafka_s2_smoke").collect()
    }
    assert {(i, f"s{i}") for i in range(10)} <= rows
