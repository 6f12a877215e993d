"""Serving layer: dashboard snapshot semantics + the TTL refresh harness
(reference app.py autorefresh/cache_data, reproduced without the UI)."""

from __future__ import annotations

from stockmarket_bigdata_project_spark.serving import (
    CachedQuery,
    dashboard_snapshot,
)


def test_snapshot_is_one_row_per_ticker_with_sane_metrics(spark, sf_dir):
    rows = dashboard_snapshot(spark, sf_dir).collect()
    keys = [r.l_suppkey for r in rows]
    assert len(keys) == len(set(keys)) > 0
    for r in rows:
        assert r.n_days >= 1
        assert r.last_close > 0
        if r.n_days == 1:
            assert r.pct_change_micro is None  # no previous close
        assert r.n_preds >= 0 and r.sum_abs_pct_err_micro >= 0


def test_cached_query_refreshes_only_past_ttl(spark, sf_dir):
    cq = CachedQuery(dashboard_snapshot, ttl_seconds=10.0)
    first = cq.get(spark, sf_dir, now=100.0)
    assert cq.refresh_count == 1
    # within TTL: same cached rows, no re-execution
    assert cq.get(spark, sf_dir, now=105.0) is first
    assert cq.refresh_count == 1
    # past TTL: re-executed
    cq.get(spark, sf_dir, now=110.0)
    assert cq.refresh_count == 2
