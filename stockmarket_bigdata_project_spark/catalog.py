"""Table catalog over the driver's parquet testdata.

The reference stores bronze/silver/gold layers in MongoDB collections
(reddit_raw, stock_raw, reddit_features_15m, training_daily_features —
reference build_training_dataset.py:21-48, README.md:446-451). Here the
storage layer is columnar parquet; tables are registered as Spark temp views
so both the DataFrame and SQL APIs reach them, and Catalyst gets filter
pushdown + column pruning into the scans for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; schema is self-describing (SURVEY §1.3).

    ``events.ts`` has shipped in two physical flavors across testdata
    generations: TIMESTAMP(NANOS) (unreadable by Spark's parquet reader —
    handled via nanosAsLong + µs truncation, matching DuckDB's ns→µs) and
    TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark surfaces as
    TIMESTAMP_NTZ. NTZ breaks event-time operators (watermarks demand
    TimestampType), so it is normalized to TimestampType under a pinned UTC
    session timezone: the NTZ→LTZ cast then preserves the stored wall-clock
    values bit-for-bit and collected values equal DuckDB's naive timestamps.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Runtime SQL confs, set here rather than at session build — callers
    # (the driver included) hand us an arbitrary SparkSession that won't
    # have them preconfigured. UTC makes the NTZ→LTZ normalization below
    # (and every to_date/window over ts) engine-portable. Pinned on EVERY
    # load, not just events, so session semantics never depend on which
    # table happened to load first (order-independent global state).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # nanos generation, read as raw longs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (idempotent)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
