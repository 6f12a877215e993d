"""Spark-vs-DuckDB result comparison mirroring the driver's correctness gate:
row-count + column-name set + order-insensitive value comparison.

Floats are compared EXACTLY (bit equality) by default — the driver hashes raw
values, so any tolerance here would hide a hash_match=false in the real gate
(round 1 lost gold_daily_features/orders_daily_rollup/join_daily_market_activity
to exactly this: local 1e-6 tolerance passed, driver hash failed). Queries must
make float outputs cross-engine deterministic (exact integer/decimal
aggregation, identical post-arithmetic), not merely close.
"""

from __future__ import annotations

import datetime as dt
import math


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _float_eq(a, b, rel=0.0, abs_tol=0.0):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    if rel == 0.0 and abs_tol == 0.0:
        return a == b  # exact, like the driver's value hash
    return math.isclose(a, b, rel_tol=rel, abs_tol=abs_tol)


def _row_sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(_canon(v))) for v in row
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
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    s_perm = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_perm = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_rows = sorted(
        (tuple(r[i] for i in s_perm) for r in spark_rows), key=_row_sort_key
    )
    d_rows = sorted(
        (tuple(r[i] for i in d_perm) for r in duck_rows), key=_row_sort_key
    )
    del order

    for rn, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for cn, (sv, dv) in enumerate(zip(sr, dr)):
            col = sorted(spark_cols)[cn]
            if isinstance(sv, float) or isinstance(dv, float):
                ok = _float_eq(
                    float(sv) if sv is not None else None,
                    float(dv) if dv is not None else None,
                    rel=float_rel,
                )
            else:
                ok = _canon(sv) == _canon(dv)
            assert ok, (
                f"{name}: value mismatch at sorted-row {rn} col {col!r}: "
                f"spark={sv!r} duck={dv!r}\n spark row={sr}\n duck row={dr}"
            )
