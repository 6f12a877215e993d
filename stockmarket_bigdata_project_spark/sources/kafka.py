"""Kafka source/sink builders (S1/S2/S13), gated behind availability.

Reference parity cites (into /root/reference):
  S1  Kafka batch scan        spark_consumer.py:69-84 (startingOffsets=earliest)
  S2  Kafka streaming scan    reddit_pipeline.py:80-88 (maxOffsetsPerTrigger,
      failOnDataLoss=false); stock_pipeline.py:68-76
  S13 Kafka producer sink     producer_training_data.py:20-26,68,109
      (JSON values, acks=all, keyed by id/ticker)

This container ships no Kafka broker and no spark-sql-kafka connector JAR, so
these builders are exercised only up to plan construction in tests; in a real
deployment they are drop-in replacements for the parquet replay source in
streaming/pipelines.py — the transformation DAG on top is identical (that is
the point of expressing the pipelines against a schema, not a source).

The payload convention matches the reference end-to-end: JSON-serialized
values decoded by from_json(value.cast string, schema) (S3), keys carrying
the partition key so Kafka partitioning lines up with the downstream groupBy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

DEFAULTS = {
    "failOnDataLoss": "false",  # reddit_pipeline.py:85
    "startingOffsets": "earliest",  # spark_consumer.py:95
}


def kafka_stream_options(
    brokers: str, topic: str, max_offsets_per_trigger: int = 10_000
) -> dict[str, str]:
    """The option set of the reference's streaming scan (S2);
    maxOffsetsPerTrigger default from reddit_pipeline.py:86."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
        **DEFAULTS,
    }


def kafka_stream_reader(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: StructType,
    max_offsets_per_trigger: int = 10_000,
):
    """S2+S3: streaming scan + JSON decode. Returns the configured reader
    and the decode function so tests can verify the plan without a broker."""
    reader = spark.readStream.format("kafka").options(
        **kafka_stream_options(brokers, topic, max_offsets_per_trigger)
    )

    def decode(raw: DataFrame) -> DataFrame:
        return (
            raw.select(F.from_json(F.col("value").cast("string"), schema).alias("d"))
            .select("d.*")
        )

    return reader, decode


def kafka_batch_reader(spark: SparkSession, brokers: str, topic: str):
    """S1: whole-topic replay as a static DataFrame."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
    )


def kafka_sink(df: DataFrame, brokers: str, topic: str, key_col: str):
    """S13: producer sink — JSON values keyed by key_col (acks=all is the
    connector default at kafka.acks)."""
    payload = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )
    return (
        payload.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.acks", "all")
    )


# No QUERIES/ORACLE: nothing to run without a broker. Registered surface is
# the builder API above; tests/test_kafka_builders.py checks plan options.
