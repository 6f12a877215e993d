"""Registry rotation invariants: the gate window (first 50 entries) must be
spent on maximum-proof-value queries, whatever the current proof state."""

from __future__ import annotations

from stockmarket_bigdata_project_spark import registry


def test_rotation_tiers_are_ordered():
    names = list(registry.all_queries())
    oracled = set(registry.all_oracle_sql())

    def tier(n: str) -> int:
        if n in registry._GATE_RED_FIXES:
            return -1
        if n in registry._PROVEN:
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
    unproven_oracled = [
        n for n in names if n in oracled and n not in registry._PROVEN
    ]
    window = names[:50]
    if len(unproven_oracled) >= 50:
        assert all(n in oracled for n in window), [
            n for n in window if n not in oracled
        ]


def test_every_query_name_is_unique_and_resolvable():
    qs = registry.all_queries()
    assert len(qs) == len(set(qs))
    for name, fn in qs.items():
        assert callable(fn), name
