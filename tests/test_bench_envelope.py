"""Unit pins for bench.py's auto-envelope baseline readers and the compact
driver record (r12→r13): the driver's BENCH_r{N}.json wraps bench stdout
and, since r8, holds only a 2000-char truncated `tail` — r13 adds a
whitespace-flushed compact final line so that tail parses again, and
splits the baseline reader into a code-fingerprinted history source
(preferred — can never be this round's own record) and a descending-scan
BENCH-record fallback (r12 ADVICE: the old reader looked only at the
single newest record and compared same-round sessions against themselves).
"""

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


def test_bench_record_readings_recover_from_truncated_tail():
    rec_path = _newest_record()
    assert rec_path is not None, "driver BENCH records exist in this repo"
    with open(rec_path) as fh:
        rec = json.load(fh)
    if rec.get("sf") != 0.1:
        return  # driver ran at a different SF; nothing to pin
    cold, steady = bench._bench_record_readings(0.1)
    assert isinstance(cold, dict) and isinstance(steady, dict)
    for out in (cold, steady):
        for name, v in out.items():
            assert isinstance(name, str) and isinstance(v, float) and v >= 0, (
                name, v,
            )
    # whichever blocks survive the 2000-char tail truncation (or the full
    # parsed dict, pre-r8 format) must be recovered, not dropped
    tail = rec.get("tail") or ""
    parsed = rec.get("parsed") or {}
    for key, out in (
        ("queries_cold", cold),
        ("curation_queries_cold", cold),
        ("queries", steady),
        ("curation_queries", steady),
    ):
        m = re.search(rf'"{key}": (\{{[^{{}}]*\}})', tail)
        src = parsed.get(key) if parsed.get(key) else (
            json.loads(m.group(1)) if m else {}
        )
        for name, v in src.items():
            assert out.get(name) == v, (key, name, v, out.get(name))


def test_bench_record_scan_descends_past_sf_mismatch(tmp_path, monkeypatch):
    """The newest record at a DIFFERENT SF must not terminate the scan:
    older records are consulted until one matches (r12 ADVICE)."""
    r98 = {
        "sf": 0.1,
        "parsed": {
            "queries_cold": {"q_demo": 1.5},
            "queries": {"q_demo": 1.0},
        },
    }
    r99 = {"sf": 0.2, "parsed": {"queries_cold": {"q_other": 9.9}}}
    (tmp_path / "BENCH_r98.json").write_text(json.dumps(r98))
    (tmp_path / "BENCH_r99.json").write_text(json.dumps(r99))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    cold, steady = bench._bench_record_readings(0.1)
    assert cold == {"q_demo": 1.5}
    assert steady == {"q_demo": 1.0}
    cold2, _ = bench._bench_record_readings(0.2)
    assert cold2 == {"q_other": 9.9}


def test_bench_record_scan_continues_past_empty_sf_match(tmp_path, monkeypatch):
    """r13 ADVICE: an SF-matching record that yields ZERO per-query data
    (the compact-line tail carries no queries_cold/queries blocks) must
    keep scanning older records instead of returning empty — from r13 on
    every driver tail is the compact line, so an unconditional return
    would permanently mask the older data-bearing records."""
    r97 = {
        "sf": 0.1,
        "parsed": {
            "queries_cold": {"q_old": 2.5},
            "queries": {"q_old": 2.0},
        },
    }
    # r13+-style record: compact-line tail, "parsed" has no per-query blocks
    r99 = {
        "sf": 0.1,
        "parsed": {"metric": "headline_queries_total", "value": 25.1},
        "tail": " " * 80 + '{"metric": "headline_queries_total"}',
    }
    (tmp_path / "BENCH_r97.json").write_text(json.dumps(r97))
    (tmp_path / "BENCH_r99.json").write_text(json.dumps(r99))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    cold, steady = bench._bench_record_readings(0.1)
    assert cold == {"q_old": 2.5}
    assert steady == {"q_old": 2.0}


def test_raw_band_quiet_pool_excludes_noisy_sessions(tmp_path, monkeypatch):
    """r13 verdict task 3: sessions recorded noisy (pre-run host canary
    >15% over the quiet anchor) stay in the pooled band but drop out of
    the quiet-only band."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    b1 = bench._raw_band("fp", 0.1, 32.0, host_canary=0.084, noisy=False)
    assert (b1["sessions"], b1["quiet_sessions"]) == (1, 1)
    b2 = bench._raw_band("fp", 0.1, 40.0, host_canary=0.107, noisy=True)
    assert (b2["sessions"], b2["quiet_sessions"]) == (2, 1)
    assert (b2["min"], b2["max"]) == (32.0, 40.0)
    assert (b2["quiet_min"], b2["quiet_max"]) == (32.0, 32.0)
    assert b2["noisy_this_session"] is True
    b3 = bench._raw_band("fp", 0.1, 31.5, host_canary=0.085, noisy=False)
    assert (b3["quiet_min"], b3["quiet_max"]) == (31.5, 32.0)
    # entries persisted with the canary + classification for later re-pooling
    hist = json.loads((tmp_path / ".bench_history.json").read_text())
    assert [e.get("noisy") for e in hist] == [False, True, False]
    assert all(e.get("host_canary") for e in hist)


def test_prev_round_readings_prefer_history_over_bench_record():
    """The history source is code-fingerprinted, so — unlike the newest
    BENCH record once the driver has written THIS round's artifact — it can
    never be the current code's own session. With a fingerprint matching no
    history entry, the most recent per-query-bearing entry at sf0.1 must be
    returned verbatim."""
    hist_path = os.path.join(ROOT, ".bench_history.json")
    with open(hist_path) as fh:
        hist = json.load(fh)
    expect = None
    for e in reversed(hist):
        # mirror the reader's same-core policy (r14 fix): a cpus=None call
        # reads local[32] baselines, and entries predating the cpus field
        # were all local[32] — the driver's post-round local[8] scaling
        # session appends a cpus=8 entry that must NOT be the expectation
        if (
            e.get("sf") == 0.1
            and e.get("queries_cold")
            and e.get("cpus", bench._LEGACY_RECORDED_CPUS)
            == bench._LEGACY_RECORDED_CPUS
        ):
            expect = e
            break
    if expect is None:
        return  # no per-query history at this SF yet; fallback path covers
    cold, steady = bench._prev_round_readings(0.1, "no-such-fingerprint")
    assert cold == expect["queries_cold"]
    assert steady == (expect.get("queries_steady") or {})
    # and the same-code exclusion: using that entry's own fingerprint must
    # NOT return it (it would be "this session's code")
    cold_same, _ = bench._prev_round_readings(0.1, expect["code"])
    if cold_same:
        assert cold_same != expect["queries_cold"] or any(
            e.get("code") != expect["code"]
            and e.get("sf") == 0.1
            and e.get("queries_cold") == expect["queries_cold"]
            for e in hist
        )


def test_prev_round_cold_unknown_sf_falls_back_to_empty():
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
        # >= 0, not > 0: a sub-0.5 ms query legitimately rounds to 0.0 at
        # bench's 3-decimal recording (r12 ADVICE) — the envelope's delta
        # computation treats 0.0 baselines as "no usable baseline"
        # explicitly, so a 0.0 here is inert, not a corruption signal
        assert all(
            isinstance(v, float) and v >= 0 for v in e["queries_cold"].values()
        )


def test_compact_line_fits_driver_tail_and_parses():
    """The whitespace-flush + compact-line protocol: the last 2000 chars of
    a stdout ending in (2000 spaces, newline, compact line, newline) must
    be a parseable JSON document carrying the decision scalars."""
    band = {
        "sessions": 3,
        "min": 31.0,
        "max": 33.0,
        "quiet_sessions": 2,
        "quiet_min": 31.0,
        "quiet_max": 32.0,
        "noisy_this_session": True,
        "policy": "x" * 500,
    }
    envelopes = {
        f"query_with_a_long_name_{i}": {"median": 1.234} for i in range(20)
    }
    queries_cold = {
        f"{n}_cold_named_query": round(0.123 + i, 3)
        for i, n in enumerate(bench.HEADLINE + bench.CURATION)
    }
    line = bench._compact_line(
        24.5, 0.1, 32.1, band, 25.0, 24.8, 0.085, 12.3, envelopes,
        queries_cold=queries_cold,
    )
    assert len(line) <= 1900
    stdout = '{"full": "record"}' * 400 + "\n" + " " * 2000 + "\n" + line + "\n"
    tail = stdout[-2000:]
    obj = json.loads(tail)
    assert obj["metric"] == "headline_queries_total"
    assert obj["value"] == 24.5
    assert obj["raw_band"] == {
        "sessions": 3,
        "min": 31.0,
        "max": 33.0,
        "quiet_sessions": 2,
        "quiet_min": 31.0,
        "quiet_max": 32.0,
        "noisy_this_session": True,
    }
    assert obj["headline_normalized_spark_r10m5"] == 24.8
    # r14 verdict task 1b: the per-query cold channel survives the tail —
    # all 28 HEADLINE+CURATION entries, untruncated, at 3 decimals
    assert obj["queries_cold"] == queries_cold
    assert "queries_cold_truncated" not in obj
    # last-line parsing (the other plausible driver strategy) also works
    assert json.loads(stdout.strip().splitlines()[-1]) == obj


def test_compact_line_sheds_derivable_blocks_before_per_query_colds():
    """Overflow order: envelope_medians and note (both derivable from
    .bench_history.json) drop before a single queries_cold entry; a
    pathological per-query dict is truncated tail-first and declared."""
    band = {
        "sessions": 1, "min": 31.0, "max": 31.0, "quiet_sessions": 1,
        "quiet_min": 31.0, "quiet_max": 31.0, "noisy_this_session": False,
    }
    envelopes = {f"envelope_query_{i}": {"median": 1.0} for i in range(12)}
    # 28 realistic names + envelopes exceeds 1900 only via the derivable
    # blocks; colds must survive intact
    queries_cold = {f"query_name_padded_out_{i:02d}": 1.234 for i in range(28)}
    big_env = {f"very_long_envelope_query_name_{i:03d}": {"median": 1.234}
               for i in range(40)}
    line = bench._compact_line(
        24.5, 0.1, 32.1, band, 25.0, 24.8, 0.085, 12.3, big_env,
        queries_cold=queries_cold,
    )
    obj = json.loads(line)
    assert len(line) <= 1900
    assert obj["queries_cold"] == queries_cold
    # pathological: a dict that cannot fit even alone is truncated
    # tail-first with the flag set, and the line still parses under 1900
    huge = {f"q_{'x' * 60}_{i:03d}": 1.234 for i in range(60)}
    line2 = bench._compact_line(
        24.5, 0.1, 32.1, band, 25.0, 24.8, 0.085, 12.3, envelopes,
        queries_cold=huge,
    )
    obj2 = json.loads(line2)
    assert len(line2) <= 1900
    assert obj2.get("queries_cold_truncated") is True
    kept = list(obj2["queries_cold"])
    assert kept == list(huge)[: len(kept)], "truncation is tail-first"


def test_raw_band_pools_same_core_count_only(tmp_path, monkeypatch):
    """r14 measurement fix: the driver also runs the bench at a LOWER core
    count to measure scaling — that session's total measures the core
    count, not the code or the box, and must not widen the local[32] band
    (and vice versa). Entries predating the cpus field were all local[32]
    and keep pooling there."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    b32 = bench._raw_band("fp", 0.1, 32.0, host_canary=0.084, cpus=32)
    assert (b32["sessions"], b32["min"], b32["max"]) == (1, 32.0, 32.0)
    # a local[8] session on the same code+SF: its own band sees only itself
    b8 = bench._raw_band("fp", 0.1, 90.0, host_canary=0.084, cpus=8)
    assert (b8["sessions"], b8["min"], b8["max"]) == (1, 90.0, 90.0)
    # and the next local[32] session's band is untouched by the 8-core total
    b32b = bench._raw_band("fp", 0.1, 33.0, host_canary=0.084, cpus=32)
    assert (b32b["sessions"], b32b["min"], b32b["max"]) == (2, 32.0, 33.0)
    # a legacy entry with no cpus field pools as local[32]
    hist = json.loads((tmp_path / ".bench_history.json").read_text())
    hist.append({"code": "fp", "sf": 0.1, "raw_headline_total": 31.0})
    (tmp_path / ".bench_history.json").write_text(json.dumps(hist))
    b32c = bench._raw_band("fp", 0.1, 34.0, host_canary=0.084, cpus=32)
    assert (b32c["sessions"], b32c["min"], b32c["max"]) == (4, 31.0, 34.0)
    # the persisted entries carry the core count for later re-pooling
    hist = json.loads((tmp_path / ".bench_history.json").read_text())
    assert [e.get("cpus") for e in hist] == [32, 8, 32, None, 32]


def test_history_baselines_skip_other_core_counts(tmp_path, monkeypatch):
    """The auto-envelope's per-query baselines must come from a same-core
    session: a local[8] entry's colds would mis-classify every local[32]
    query as regressed."""
    hist = [
        {
            "code": "old32",
            "sf": 0.1,
            "raw_headline_total": 32.0,
            "queries_cold": {"q": 1.0},
            "queries_steady": {"q": 0.8},
        },
        {
            "code": "old8",
            "sf": 0.1,
            "cpus": 8,
            "raw_headline_total": 90.0,
            "queries_cold": {"q": 3.0},
            "queries_steady": {"q": 2.5},
        },
    ]
    (tmp_path / ".bench_history.json").write_text(json.dumps(hist))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    # at cpus=32 the newest same-core entry is the legacy (no-cpus) one
    cold, steady = bench._history_readings(0.1, "current", cpus=32)
    assert (cold, steady) == ({"q": 1.0}, {"q": 0.8})
    # at cpus=8 only the 8-core entry qualifies
    cold8, steady8 = bench._history_readings(0.1, "current", cpus=8)
    assert (cold8, steady8) == ({"q": 3.0}, {"q": 2.5})


def test_bench_record_readings_skip_other_core_records(tmp_path, monkeypatch):
    """The BENCH-record fallback likewise skips a record stamped with a
    different core count (the driver wrapper writes `cpus` at top level)."""
    r98 = {
        "sf": 0.1,
        "cpus": 8,
        "parsed": {"queries_cold": {"q": 3.0}, "queries": {"q": 2.5}},
    }
    r97 = {
        "sf": 0.1,
        "cpus": 32,
        "parsed": {"queries_cold": {"q": 1.0}, "queries": {"q": 0.8}},
    }
    (tmp_path / "BENCH_r98.json").write_text(json.dumps(r98))
    (tmp_path / "BENCH_r97.json").write_text(json.dumps(r97))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    cold, steady = bench._bench_record_readings(0.1, cpus=32)
    assert (cold, steady) == ({"q": 1.0}, {"q": 0.8})
    # a legacy record with NO cpus field was a local[32] run (r14 ADVICE):
    # it must baseline a cpus=32 read and be skipped by a cpus=8 read —
    # the other two readers already apply this legacy-as-32 policy
    r99 = {
        "sf": 0.1,
        "parsed": {"queries_cold": {"q": 1.5}, "queries": {"q": 1.2}},
    }
    (tmp_path / "BENCH_r99.json").write_text(json.dumps(r99))
    cold32, steady32 = bench._bench_record_readings(0.1, cpus=32)
    assert (cold32, steady32) == ({"q": 1.5}, {"q": 1.2})
    cold8, steady8 = bench._bench_record_readings(0.1, cpus=8)
    assert (cold8, steady8) == ({"q": 3.0}, {"q": 2.5})
