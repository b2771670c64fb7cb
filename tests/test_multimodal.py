"""Multimodal column plumbing: schema, Arrow batching, deterministic
fake decode, frame-sample planning (ops/multimodal.py).  The real
codecs are stubbed (not installed here); the Spark-side pipeline is
real."""

from __future__ import annotations

import numpy as np
import pytest

from opensearch_spark.ops import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=48)


def test_decode_stub_requires_opt_in():
    with pytest.raises(NotImplementedError):
        mm.decode_stub(b"abc")


def test_decode_stub_deterministic():
    a = mm.decode_stub(b"payload", deterministic_fake=True)
    b = mm.decode_stub(b"payload", deterministic_fake=True)
    assert np.array_equal(a, b)
    assert a.shape == (mm.FEATURE_DIM,)
    assert a.dtype == np.float32


def test_extract_features_pipeline(spark, media):
    out = mm.extract_features(media, deterministic_fake=True, target_partitions=4)
    rows = out.collect()
    assert len(rows) == 48
    by_id = {r["media_id"]: r for r in rows}
    # cross-check one row against the driver-side stub
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid in (0, 7, 33):
        expect = mm.decode_stub(src[mid], deterministic_fake=True)
        got = np.array(by_id[mid]["features"], dtype=np.float32)
        assert np.allclose(got, expect)
        assert by_id[mid]["n_bytes"] == len(src[mid])
    assert {r["modality"] for r in rows} == {"image", "audio", "video"}


def test_frame_sample_plan(spark, media):
    plan = mm.frame_sample_plan(media, every_ms=500)
    rows = plan.collect()
    assert rows
    # only video rows, frames cover [0, duration] inclusive at 500ms step
    vids = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.collect()
        if r["meta"]["modality"] == "video"
    }
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ms"])
    assert set(by_id) == set(vids)
    for mid, frames in by_id.items():
        assert frames == sorted(frames)
        assert frames[0] == 0
        assert frames[-1] <= vids[mid]
        assert len(frames) == vids[mid] // 500 + 1


def test_real_wav_decode_features():
    """The stdlib WAV decoder recovers exact header facts and sensible
    PCM statistics from a generated payload."""
    payload = mm.make_wav(seed=5, i=1, sr=16000, n_frames=816)
    f = mm.decode_media(payload, "audio/wav")
    assert f.shape == (mm.FEATURE_DIM,)
    assert f[0] == pytest.approx(816 / 16000)   # duration_s
    assert f[1] == pytest.approx(16000 / 48000)  # sample rate
    assert 0 < f[2] <= f[3] <= 1.0               # rms <= peak, normalized
    assert 0 < f[4] < 1.0                        # zero-crossing rate


def test_real_bmp_decode_features():
    """The BMP decoder recovers dimensions and the exact fill color."""
    import hashlib

    payload = mm.make_bmp(seed=5, i=0, w=9, h=6)
    r, g, b = hashlib.sha256(b"bmp-5-0").digest()[:3]
    f = mm.decode_media(payload, "image/bmp")
    assert f[0] == pytest.approx(9 / 4096)
    assert f[1] == pytest.approx(6 / 4096)
    assert f[2] == pytest.approx(r / 255.0, abs=1e-6)
    assert f[3] == pytest.approx(g / 255.0, abs=1e-6)
    assert f[4] == pytest.approx(b / 255.0, abs=1e-6)
    assert f[5] == pytest.approx(0.0, abs=1e-6)  # solid color -> zero luma std


def test_use_codecs_pipeline_and_honest_stub(spark, media):
    """use_codecs decodes wav+bmp rows for real inside mapInPandas; the
    mp4 rows must still raise the honest stub error."""
    real = media.filter("meta.modality <> 'video'")
    out = {r["media_id"]: r for r in mm.extract_features(real, use_codecs=True).collect()}
    src = {r["media_id"]: (bytes(r["payload"]), r["meta"]["mime"]) for r in real.collect()}
    for mid in (0, 1, 3, 4):
        expect = mm.decode_media(*src[mid])
        got = np.array(out[mid]["features"], dtype=np.float32)
        assert np.allclose(got, expect), mid
    with pytest.raises(Exception):  # NotImplementedError surfaces via the UDF
        mm.extract_features(
            media.filter("meta.modality = 'video'"), use_codecs=True
        ).collect()
