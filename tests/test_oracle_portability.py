"""Environment-sensitivity triangulation for the driver's correctness gate.

Round 3 burned 7 gate rows on a class the bit-exact local replay
(oracle_compare.py) is structurally blind to: the local comparator fetches
DuckDB results via ``fetchall()`` (native Python ints), while the driver
fetches via a pandas/arrow conversion that renders DuckDB's 128-bit HUGEINT
differently from int64. Every ``sum()`` over an integer column in DuckDB
returns HUGEINT, so every oracle that aggregated the repo's own
integer-exact outputs produced a column whose *driver-side dtype* diverged
from Spark's BIGINT — all six r3 hash_match=false rows had exactly one such
column, and none of the 43 green rows had any (CORRECTNESS_r03.json; the
r3-green `excess_share_suppliers_q20` carried one in r2's differently
versioned driver, which is why the class was invisible until now).

These tests close the blind spot at the *type* level, where the divergence
actually lives, without executing anything:

* every oracle's DuckDB output schema must stay inside the portable type
  set (no HUGEINT, DECIMAL, LIST, STRUCT, ...) — this test FAILS on all six
  r3 reds before their fix;
* every oracle-checked Spark result must be canonicalizable by the driver
  (no array/map/struct columns — the r3 ``embedding_int8_quantization``
  harness crash: pandas ``sort_values`` cannot factorize list values) and
  must match the oracle column-for-column in name and type family.
"""

from __future__ import annotations

import duckdb
import pytest

from stockmarket_bigdata_project_spark import registry
from stockmarket_bigdata_project_spark.catalog import TABLES, table_path

# DuckDB result types the driver's pandas conversion maps onto the same
# dtype family as the Spark result. Everything else — HUGEINT above all,
# but also DECIMAL (object/Decimal in pandas), LIST/STRUCT/MAP, INTERVAL,
# unsigned ints — is a gate hazard even when values are numerically equal.
PORTABLE_DUCK = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "TIMESTAMP", "DATE", "BOOLEAN",
}
PORTABLE_SPARK = {
    "bigint", "int", "smallint", "tinyint",
    "double", "float", "string", "timestamp", "timestamp_ntz", "date",
    "boolean",
}

_FAMILY = {
    **{t: "int" for t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                          "bigint", "int", "smallint", "tinyint")},
    **{t: "float" for t in ("DOUBLE", "FLOAT", "double", "float")},
    "VARCHAR": "str", "string": "str",
    "TIMESTAMP": "ts", "timestamp": "ts", "timestamp_ntz": "ts",
    "DATE": "date", "date": "date",
    "BOOLEAN": "bool", "boolean": "bool",
}

_ORACLES = registry.all_oracle_sql()


@pytest.fixture(scope="module")
def duck_types():
    """Lazily-bound DuckDB output schema per oracle (no execution: binding
    resolves types, which is all the lint needs)."""
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')"
        )
    out = {}
    for name, sql in _ORACLES.items():
        rel = con.sql(sql)
        out[name] = dict(zip(rel.columns, (str(t) for t in rel.types)))
    con.close()
    return out


def test_no_oracle_emits_a_nonportable_duckdb_type(duck_types):
    bad = {
        name: {c: t for c, t in cols.items()
               if t.split("(")[0] not in PORTABLE_DUCK}
        for name, cols in duck_types.items()
    }
    bad = {n: c for n, c in bad.items() if c}
    assert not bad, (
        "oracle output columns outside the portable DuckDB type set "
        f"(sum(int) -> HUGEINT is the r3 killer): {bad}"
    )


def test_oracle_checked_spark_schemas_match_and_canonicalize(
    registry_surfaces, duck_types
):
    """Schemas come from the shared one-pass construction sweep (conftest
    registry_surfaces) — DataFrame analysis is conf-independent, so the
    lint-conf pass serves both this sweep and the broadcast lint."""
    problems = []
    for name, dcols in duck_types.items():
        rec = registry_surfaces[name]
        if "error" in rec:
            problems.append((name, "construction failed", rec["error"]))
            continue
        scols = rec["schema"]
        if set(scols) != set(dcols):
            problems.append((name, "column-name mismatch",
                             sorted(set(scols) ^ set(dcols))))
            continue
        for c, st in scols.items():
            if st not in PORTABLE_SPARK:
                problems.append(
                    (name, f"non-canonicalizable Spark column {c}", st)
                )
            elif _FAMILY[st] != _FAMILY[dcols[c].split("(")[0]]:
                problems.append(
                    (name, f"type-family mismatch on {c}", (st, dcols[c]))
                )
    assert not problems, problems


def test_lint_actually_catches_nonportable_types():
    """Guard the guard: the portable-type check must FLAG the exact shapes
    that burned round 3 — a bare sum over an integer column (HUGEINT) and
    a list output — when fed deliberately-bad SQL. If DuckDB ever changes
    sum()'s return type, this tells us the lint's premise moved."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 1::BIGINT AS x")

    rel = con.sql("SELECT sum(x) AS s FROM t")
    assert str(rel.types[0]).split("(")[0] not in PORTABLE_DUCK, rel.types

    rel = con.sql("SELECT [x, x] AS lst FROM t")
    assert str(rel.types[0]).split("(")[0] not in PORTABLE_DUCK, rel.types

    rel = con.sql("SELECT CAST(sum(x) AS BIGINT) AS s FROM t")
    assert str(rel.types[0]).split("(")[0] in PORTABLE_DUCK, rel.types
    con.close()
