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
