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


def test_real_decoder_gates_cleanly_without_pil():
    """Where the imaging stack isn't shipped, the real-decode seam must
    fail loud with NotImplementedError (documented stub), never a silent
    wrong answer."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            M.decode_image_real(b"\x00" * 16, 4, 4)
    else:
        pytest.skip("PIL present: covered by test_real_image_features_with_pil")


def test_real_image_features_with_pil(spark):
    """PIL-gated (the protobuf-gate pattern from transformWithState): stage
    tiny real PNGs, decode them through the SAME mapInPandas batch loop as
    image_features, and match dims + mean pixel against a PIL-side
    metadata twin computed outside Spark. Skips clean where PIL is absent;
    green where it exists."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    staged = []
    expect = {}
    for media_id, (w, h, fill) in enumerate(
        [(4, 3, 17), (8, 8, 200), (5, 2, 0)]
    ):
        arr = (np.arange(w * h, dtype=np.uint8).reshape(h, w) + fill) % 256
        buf = io.BytesIO()
        PIL_Image.fromarray(arr, mode="L").save(buf, format="PNG")
        staged.append((media_id, bytearray(buf.getvalue()), w, h))
        expect[media_id] = (w, h, float(round(float(arr.mean()), 6)))
    df = spark.createDataFrame(
        staged, "media_id long, payload binary, width int, height int"
    )
    got = {
        r.media_id: (r.width, r.height, r.mean_px)
        for r in M.real_image_features(df).collect()
    }
    assert got == expect
