"""Unit pins for bench.py's auto-envelope baseline reader (r12): the
driver's BENCH_r{N}.json wraps the bench output and, since r8, holds only
a 2000-char truncated `tail` with an empty `parsed` dict — the reader
must recover whatever cold blocks survive truncation instead of silently
returning an empty baseline (the r12 bring-up bug: the first session
compared against nothing and no auto-envelope could ever fire)."""

from __future__ import annotations

import glob
import json
import os
import re

import bench

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_record():
    best, best_n = None, -1
    for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best


def test_prev_round_cold_recovers_from_truncated_tail():
    rec_path = _newest_record()
    assert rec_path is not None, "driver BENCH records exist in this repo"
    with open(rec_path) as fh:
        rec = json.load(fh)
    if rec.get("sf") != 0.1:
        return  # driver ran at a different SF; nothing to pin
    out = bench._prev_round_cold(0.1, "no-such-fingerprint")
    assert isinstance(out, dict)
    for name, v in out.items():
        assert isinstance(name, str) and isinstance(v, float) and v > 0, (
            name, v,
        )
    # whichever cold block survives the 2000-char tail truncation (or the
    # full parsed dict, pre-r8 format) must be recovered, not dropped
    tail = rec.get("tail") or ""
    parsed = rec.get("parsed") or {}
    for key in ("queries_cold", "curation_queries_cold"):
        m = re.search(rf'"{key}": (\{{[^{{}}]*\}})', tail)
        src = parsed.get(key) if parsed.get(key) else (
            json.loads(m.group(1)) if m else {}
        )
        for name, v in src.items():
            assert out.get(name) == v, (key, name, v, out.get(name))


def test_prev_round_cold_unknown_sf_falls_back_to_history_or_empty():
    # an SF the driver never benched: the BENCH-record path yields nothing;
    # only a different-fingerprint history entry at that SF may fill in
    out = bench._prev_round_cold(123.456, "no-such-fingerprint")
    assert out == {}


def test_history_entries_carry_per_query_colds_for_future_baselines():
    hist_path = os.path.join(ROOT, ".bench_history.json")
    with open(hist_path) as fh:
        hist = json.load(fh)
    assert hist, "bench history tracked in git"
    r12_plus = [e for e in hist if e.get("queries_cold")]
    assert r12_plus, "r12+ sessions must record per-query colds"
    for e in r12_plus:
        assert e.get("code") and e.get("sf") is not None
        assert all(v > 0 for v in e["queries_cold"].values())
