"""The primary correctness gate, run locally: every registered query with an
oracle is executed on Spark and DuckDB over the same parquet and compared
(row-count + schema + order-insensitive values) — SURVEY §5.2(1).
"""

from __future__ import annotations

import pytest

from stockmarket_bigdata_project_spark import registry

from .oracle_compare import compare

_QUERIES = registry.all_queries()
_ORACLE = registry.all_oracle_sql()


def test_every_oracle_has_query():
    missing = set(_ORACLE) - set(_QUERIES)
    assert not missing, f"oracle SQL without query impl: {missing}"


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_match(name, spark, duck, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    compare(df, duck, _ORACLE[name], name=name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_rows_only_queries_run(name, spark, sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0
