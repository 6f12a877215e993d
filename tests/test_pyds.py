"""Mechanics of the custom Python DataSource (sources/pyds.py): partition
planning, filter-pushdown absorption, and the Arrow-vectorized read path.
Value-level equivalence is covered by test_oracle via the registry."""

from __future__ import annotations

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
)

from stockmarket_bigdata_project_spark.sources.pyds import _TickReader


def _reader(**options) -> _TickReader:
    return _TickReader({k: str(v) for k, v in options.items()})


def test_partitions_cover_range_without_overlap():
    r = _reader(n_rows=100_000, n_partitions=8)
    parts = r.partitions()
    assert len(parts) == 8
    assert parts[0].start == 0 and parts[-1].end == 100_000
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start  # contiguous, disjoint


def test_pushdown_narrows_slices_and_absorbs_only_range_filters():
    r = _reader(n_rows=100_000, n_partitions=8)
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("tick_id",), 90_000),
                LessThan(("tick_id",), 95_000),
                GreaterThan(("tick_id",), 89_999),
                EqualTo(("symbol",), "S3"),  # not absorbable
            ]
        )
    )
    assert leftover == [EqualTo(("symbol",), "S3")]
    parts = r.partitions()
    assert parts[0].start == 90_000 and parts[-1].end == 95_000


def test_empty_pushdown_range_yields_no_rows():
    r = _reader(n_rows=100_000, n_partitions=8)
    list(r.pushFilters([GreaterThanOrEqual(("tick_id",), 70_000),
                        LessThan(("tick_id",), 60_000)]))
    parts = r.partitions()
    total = sum(p.end - p.start for p in parts)
    assert total == 0


def test_read_is_arrow_batches_with_declared_columns():
    import pyarrow as pa

    r = _reader(n_rows=1_000, n_partitions=1)
    (part,) = r.partitions()
    (batch,) = list(r.read(part))
    assert isinstance(batch, pa.RecordBatch)
    assert batch.schema.names == ["tick_id", "ts", "symbol", "px", "qty"]
    assert batch.num_rows == 1_000


def test_scan_end_to_end(spark):
    from stockmarket_bigdata_project_spark.sources.pyds import _register

    _register(spark)
    df = (
        spark.read.format("ticks")
        .option("n_rows", 10_000)
        .option("n_partitions", 4)
        .load()
    )
    assert df.count() == 10_000
    assert df.rdd.getNumPartitions() == 4


def test_stream_reader_restart_never_regresses_offsets():
    """Restart-from-checkpoint contract: Spark re-creates the stream reader
    (initialOffset NOT called) and replays the last planned batch via
    partitions(start, end) from the offset log. The next latestOffset()
    must be >= the replayed end — a fresh instance that restarts its
    high-water mark at 0 would regress the offset log."""
    from stockmarket_bigdata_project_spark.sources.pyds import (
        _TickStreamReader,
    )

    r = _TickStreamReader({"n_rows": "100000", "rows_per_batch": "25000"})
    r.partitions({"tick": 50_000}, {"tick": 75_000})  # checkpoint replay
    assert r.latestOffset()["tick"] >= 75_000
    # commit path ratchets too (all-committed restart, no replay needed)
    r2 = _TickStreamReader({"n_rows": "100000", "rows_per_batch": "25000"})
    r2.commit({"tick": 75_000})
    assert r2.latestOffset()["tick"] >= 75_000
