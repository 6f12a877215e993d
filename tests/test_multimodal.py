"""Multimodal plumbing tests: Arrow batch shape, determinism, stub gating.

The value-level correctness of the binary pipeline is oracle-checked in
test_oracle.py (payload hashes, frame slices, feature buckets); this file
pins what the oracle can't see — the mapInPandas batch mechanics and the
real-decoder stub contract.
"""

from __future__ import annotations

import pytest

from stockmarket_bigdata_project_spark.llmdata import multimodal as M


def test_payload_is_binary_and_opaque(spark, sf_dir):
    m = M.media_table(spark, sf_dir)
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.select("payload", "meta").first()
    assert isinstance(bytes(row.payload), bytes)
    assert len(bytes(row.payload)) == M.N_FRAMES * M.FRAME_LEN
    assert set(row.meta.asDict()) == {"width", "height", "n_frames", "sample_rate"}


def test_image_features_deterministic_across_runs(spark, sf_dir):
    a = {r.media_id: r.f0 for r in M.image_features(spark, sf_dir).collect()}
    b = {r.media_id: r.f0 for r in M.image_features(spark, sf_dir).collect()}
    assert a == b and a


def test_audio_rms_chunk_fanout(spark, sf_dir):
    """Each audio asset yields exactly payload_len // FRAME_LEN chunks."""
    n_audio = M.media_table(spark, sf_dir).filter("kind = 'audio'").count()
    rms = M.audio_chunk_rms(spark, sf_dir)
    assert rms.count() == n_audio * M.N_FRAMES
    assert rms.select("media_id").distinct().count() == n_audio


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"\x00" * 16, 4, 4)
