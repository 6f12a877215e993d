"""Registry rotation invariants: the gate window (first 50 entries) must be
spent on maximum-proof-value queries, whatever the current proof state."""

from __future__ import annotations

from stockmarket_bigdata_project_spark import registry


def _effective_sets():
    dyn_proven, dyn_red = registry._dynamic_proof_state()
    proven = (registry._PROVEN | dyn_proven) - dyn_red
    red = (registry._STATIC_RED_FIXES | dyn_red) - proven
    return proven, red


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
    """The r1/r2 records ship with the repo: the dynamic loader must see
    them and agree with the transcribed floor (r2's one red row included)."""
    dyn_proven, dyn_red = registry._dynamic_proof_state()
    assert "gold_daily_features" in dyn_proven  # green in r2
    assert "supplier_daily_ohlcv" in dyn_proven  # green in r1
    # two_level_rollup: red in r02 unless a LATER recorded round proves it
    if "two_level_rollup" not in dyn_proven:
        assert "two_level_rollup" in dyn_red


def test_every_query_name_is_unique_and_resolvable():
    qs = registry.all_queries()
    assert len(qs) == len(set(qs))
    for name, fn in qs.items():
        assert callable(fn), name
