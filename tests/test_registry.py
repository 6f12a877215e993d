"""Registry rotation invariants: the gate window (first 50 entries) must be
spent on maximum-proof-value queries, whatever the current proof state."""

from __future__ import annotations

from stockmarket_bigdata_project_spark import registry


def _effective_sets():
    return registry._dynamic_proof_state()


def test_rotation_tiers_are_ordered():
    names = list(registry.all_queries())
    oracled = set(registry.all_oracle_sql())
    proven, red = _effective_sets()

    def tier(n: str) -> int:
        if n in red:
            # a red rows-only query fronts the rows-only tier instead of
            # consuming a hash-checkable fix slot (registry._rotate)
            return -1 if n in oracled else 1
        if n in proven:
            return 2
        if n in oracled:
            return 0
        return 1

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), "red fixes < unproven-oracled < rows-only < proven"


def test_window_has_no_wasted_slots():
    """Every slot in the 50-query gate window must be value-checkable
    (an oracle exists) unless the registry has run out of unproven
    oracle-checked queries — rows-only checks may not consume a window
    slot a hash-checkable query could use."""
    names = list(registry.all_queries())
    oracled = set(registry.all_oracle_sql())
    proven, _ = _effective_sets()
    unproven_oracled = [n for n in names if n in oracled and n not in proven]
    window = names[:50]
    if len(unproven_oracled) >= 50:
        assert all(n in oracled for n in window), [
            n for n in window if n not in oracled
        ]


def test_dynamic_proof_state_reads_recorded_rounds():
    """Proof state derives ENTIRELY from the recorded CORRECTNESS files
    (the static per-round transcriptions are retired): the loader must
    reproduce the r1-r4 history — latest result wins per query."""
    dyn_proven, dyn_red = registry._dynamic_proof_state()
    assert "gold_daily_features" in dyn_proven  # green in r2
    assert "supplier_daily_ohlcv" in dyn_proven  # green in r1
    # red r1-r3, fixed and proven green in r4 — latest state must win
    assert "two_level_rollup" in dyn_proven
    assert "embedding_int8_quantization" in dyn_proven
    # errored in r1 (rows-only, since-fixed NANOS read), never re-attempted:
    # stays red until a recorded round shows it attempted-clean
    assert "approx_count_distinct_users" in dyn_red
    assert dyn_proven.isdisjoint(dyn_red)


def test_round5_window_composition():
    """The round-5 gate window (first 50 entries) must land on the
    reference-facing zero-proof blocks the r4 verdict enumerated: sources,
    ml, text/scalar functions, finance, streaming lifecycle, serving —
    including the named user-first surfaces."""
    names = list(registry.all_queries())[:50]
    by_prefix = {}
    from stockmarket_bigdata_project_spark.registry import _MODULE_PATHS  # noqa: F401

    must_have = {
        "extract_tickers_v1", "extract_tickers_v2", "sentiment_score",
        "predict_returns", "eval_metrics", "csv_scan_events",
        "json_payload_decode", "vwap_daily", "twap_hourly",
        "dashboard_snapshot", "upsert_merge_daily",
        "bucketed_join_orders_lineitem", "python_datasource_ticks",
        "stateful_running_vwap",
    }
    missing = must_have - set(names)
    assert not missing, f"r5 window lost required surfaces: {missing}"
    proven, _ = _effective_sets()
    already = [n for n in names if n in proven]
    assert not already, f"r5 window wastes slots on proven queries: {already}"


def test_every_query_name_is_unique_and_resolvable():
    qs = registry.all_queries()
    assert len(qs) == len(set(qs))
    for name, fn in qs.items():
        assert callable(fn), name
