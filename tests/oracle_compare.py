"""Spark-vs-DuckDB result comparison mirroring the driver's correctness gate:
row-count + column-name set + order-insensitive value comparison.

Floats are compared by BIT PATTERN (``struct.pack('>d', v)``) by default — the
driver hashes raw values, so any equivalence granted here that the hash does
not grant hides a future hash_match=false. Two rounds proved this the hard
way: round 1 lost three queries to a 1e-6 tolerance the driver doesn't have,
and round 2 lost ``two_level_rollup`` while this file still passed it —
Python ``==`` treats ``-0.0 == 0.0`` and ``2 == 2.0``, the driver's hash does
not. Queries must make float outputs cross-engine bit-identical (exact
integer/decimal aggregation, identical post-arithmetic), not merely close,
and must not rely on int/float type coercion between the engines.
"""

from __future__ import annotations

import datetime as dt
import math
import struct


def _canon(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _values_eq(a, b, rel=0.0):
    """Driver-faithful value equality: None only equals None; floats equal
    iff their IEEE-754 bit patterns match (NaN==NaN as the one concession —
    both engines surface the canonical quiet NaN); a float never equals an
    int (the driver hashes the value as typed); containers recurse."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if not (isinstance(a, float) and isinstance(b, float)):
            return False
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        if rel:
            return math.isclose(a, b, rel_tol=rel)
        return struct.pack(">d", a) == struct.pack(">d", b)
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(
            _values_eq(x, y, rel) for x, y in zip(a, b)
        )
    if type(a).__name__ != type(b).__name__:
        return False
    return _canon(a) == _canon(b)


def _sort_canon(v):
    """Total-order sort key (used only to align rows before the element-wise
    compare; equality itself is _values_eq). Floats key on bit pattern so
    -0.0 and 0.0 rows can't mask each other."""
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return (v, struct.pack(">d", v))
    return _canon(v)


def _row_sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(_sort_canon(v))) for v in row
    )


def compare(spark_df, duck_con, sql, name="query", float_rel=0.0):
    """Assert Spark result ≡ DuckDB result (order-insensitive)."""
    duck_res = duck_con.execute(sql)
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = duck_res.fetchall()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch\n spark={sorted(spark_cols)}\n duck ={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    # align column order by sorted name (the driver sorts columns by name)
    s_perm = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_perm = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_rows = sorted(
        (tuple(r[i] for i in s_perm) for r in spark_rows), key=_row_sort_key
    )
    d_rows = sorted(
        (tuple(r[i] for i in d_perm) for r in duck_rows), key=_row_sort_key
    )

    cols_sorted = sorted(spark_cols)
    for rn, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for cn, (sv, dv) in enumerate(zip(sr, dr)):
            assert _values_eq(sv, dv, rel=float_rel), (
                f"{name}: value mismatch at sorted-row {rn} col "
                f"{cols_sorted[cn]!r}: spark={sv!r} duck={dv!r}\n"
                f" spark row={sr}\n duck row={dr}"
            )
