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


# ---------------------------------------------------- real PNG codec (r4)


def test_real_png_decode_roundtrip():
    """make_png cycles filter types 0-4 across scanlines; the decoder's
    unfilter must reconstruct the exact gradient pixels (checked via
    channel means recomputed independently from the generator formula)."""
    import numpy as np

    for alpha in (False, True):
        w, h = 11, 7  # h=7 -> filters 0,1,2,3,4,0,1 all exercised
        payload = mm.make_png(seed=5, i=3, w=w, h=h, alpha=alpha)
        f = mm.decode_media(payload, "image/png")
        assert len(f) == mm.FEATURE_DIM
        import hashlib as _h

        sr, sg, sb = _h.sha256(b"png-5-3").digest()[:3]
        ys, xs = np.mgrid[0:h, 0:w]
        r = ((xs * 17 + sr) & 0xFF) / 255.0
        g = ((ys * 29 + sg) & 0xFF) / 255.0
        b = (((xs + ys) * 13 + sb) & 0xFF) / 255.0
        assert abs(f[0] - w / 4096.0) < 1e-6 and abs(f[1] - h / 4096.0) < 1e-6
        assert abs(f[2] - r.mean()) < 1e-6
        assert abs(f[3] - g.mean()) < 1e-6
        assert abs(f[4] - b.mean()) < 1e-6
        luma = 0.299 * r + 0.587 * g + 0.114 * b
        assert abs(f[5] - luma.std()) < 1e-6
        if alpha:
            a = ((255 - 7 * (xs + ys)) & 0xFF) / 255.0
            assert abs(f[6] - a.mean()) < 1e-6
        else:
            assert f[6] == 1.0


def test_png_grayscale_and_honest_gaps():
    """Grayscale decode plus the honest NotImplementedError gaps
    (palette / 16-bit / interlaced)."""
    import struct
    import zlib

    import numpy as np

    def png(ctype, depth=8, interlace=0, w=4, h=3, ch=1):
        px = (np.arange(h * w * ch, dtype=np.uint8) * 7).reshape(h, w * ch)
        scan = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        return (mm._PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))

    f = mm.decode_media(png(0), "image/png")  # grayscale
    px = (np.arange(12, dtype=np.uint8) * 7) / 255.0
    assert abs(f[2] - px.mean()) < 1e-6 and f[2] == f[3] == f[4]
    assert abs(f[5] - px.std()) < 1e-6

    with pytest.raises(NotImplementedError, match="palette"):
        mm.decode_media(png(3), "image/png")
    with pytest.raises(NotImplementedError, match="8-bit only"):
        mm.decode_media(png(0, depth=16), "image/png")
    with pytest.raises(NotImplementedError, match="interlaced"):
        mm.decode_media(png(0, interlace=1), "image/png")
    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_media(b"JUNK" * 4, "image/png")


def test_use_codecs_includes_png_rows(spark, media):
    """synthetic_media's image rows alternate BMP/PNG; use_codecs must
    decode BOTH for real inside mapInPandas."""
    imgs = media.filter("meta.modality = 'image'")
    src = {r["media_id"]: (bytes(r["payload"]), r["meta"]["mime"])
           for r in imgs.collect()}
    mimes = {m for _, m in src.values()}
    assert mimes == {"image/bmp", "image/png"}
    out = {r["media_id"]: r for r in
           mm.extract_features(imgs, use_codecs=True).collect()}
    assert set(out) == set(src)
    for mid, (payload, mime) in src.items():
        expect = mm.decode_media(payload, mime)
        got = out[mid]["features"]
        assert np.allclose(got, expect, atol=1e-6), (mid, mime)


# ------------------------------------------------------- GIF (r4 late)


def test_real_gif_decode_roundtrip():
    """make_gif -> _decode_gif round-trip: channel means equal the
    generator raster's palette-mapped means; interlaced and plain
    encodings of the same raster decode identically."""
    import hashlib

    import numpy as np

    from opensearch_spark.ops.multimodal import (
        _decode_gif,
        decode_media,
        make_gif,
    )

    f = _decode_gif(make_gif(5, 1))
    digest = hashlib.sha256(b"gif-5-1").digest()
    w, h, nc = 10, 7, 8
    pal = np.array(
        [[digest[(3 * c) % 32], digest[(3 * c + 1) % 32],
          digest[(3 * c + 2) % 32]] for c in range(nc)]
    )
    idx = np.array(
        [(x + y * w + digest[(x + 7 * y) % 32]) % nc
         for y in range(h) for x in range(w)]
    )
    px = pal[idx.reshape(h, w)] / 255.0
    assert abs(f[0] - w / 4096.0) < 1e-7 and abs(f[1] - h / 4096.0) < 1e-7
    for k, ch in enumerate(range(3)):
        assert abs(f[2 + k] - px[..., ch].mean()) < 1e-6
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert abs(f[5] - luma.std()) < 1e-6
    assert f[6] == 1.0 and abs(f[7] * 256 - 1) < 1e-5
    # interlaced encoding of the same raster: identical features
    fi = _decode_gif(make_gif(5, 1, interlace=True))
    assert np.allclose(f, fi)
    # animated: frame count lands in slot 7; stats still frame 1
    fa = _decode_gif(make_gif(5, 1, frames=3))
    assert abs(fa[7] * 256 - 3) < 1e-5
    assert np.allclose(f[:7], fa[:7])
    # dispatch through the mime router
    assert np.allclose(decode_media(make_gif(5, 1), "image/gif"), f)


def test_gif_lzw_width_growth_and_errors():
    """A 64-color 64x48 raster forces LZW code-width growth past the
    initial width; truncated data and bad signatures raise."""
    import pytest

    from opensearch_spark.ops.multimodal import _decode_gif, make_gif

    big = make_gif(9, 2, w=64, h=48, n_colors=64)
    f = _decode_gif(big)
    assert abs(f[0] * 4096 - 64) < 1e-3 and abs(f[1] * 4096 - 48) < 1e-3
    with pytest.raises(ValueError, match="not a GIF"):
        _decode_gif(b"NOPE" + big[4:])
    # chop the raster data: the LZW stream must refuse to underfill
    with pytest.raises(ValueError):
        _decode_gif(big[: len(big) // 2])


# ------------------------------------------------------------------ JPEG

def test_jpeg_roundtrip_accuracy():
    """Encoder->decoder round trip: solid colors within quant error,
    smooth gradients within a few levels, exact shape preservation."""
    import numpy as np

    from opensearch_spark.ops.jpegcodec import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    solid = np.full((16, 24, 3), [200, 64, 32], np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(solid))
    assert dec.shape == (16, 24, 3)
    assert np.abs(dec.astype(int) - solid.astype(int)).max() <= 3

    y, x = np.mgrid[0:17, 0:19]  # non-multiple-of-8 dims exercise padding
    grad = np.stack(
        [(x * 6) % 256, (y * 7) % 256, ((x + y) * 3) % 256], axis=2
    ).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(grad))
    assert dec.shape == grad.shape
    err = np.abs(dec.astype(int) - grad.astype(int))
    assert err.mean() < 4.0


def test_jpeg_grayscale_and_determinism():
    import numpy as np

    from opensearch_spark.ops.jpegcodec import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    y, x = np.mgrid[0:12, 0:14]
    img = ((x + y) * 4 % 256).astype(np.uint8)
    b1 = encode_baseline_jpeg(img)
    assert b1 == encode_baseline_jpeg(img)  # byte-stable
    dec = decode_baseline_jpeg(b1)
    assert dec.shape == (12, 14, 3)
    assert np.abs(dec[..., 0].astype(int) - img.astype(int)).mean() < 4.0
    # grayscale replicates Y into all three channels
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()


def test_jpeg_honest_gaps_and_errors():
    import numpy as np
    import pytest

    from opensearch_spark.ops.jpegcodec import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    img = np.zeros((8, 8, 3), np.uint8)
    good = encode_baseline_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"NOPE" + good)
    # forge a progressive SOF2 marker: honest NotImplementedError
    prog = bytearray(good)
    sof_at = prog.find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF0"):
        decode_baseline_jpeg(bytes(prog))
    # forge a 3x3 sampling factor (legal in T.81 but not a power of
    # two, so the replication upsampler can't honor it): honest error
    sub = bytearray(good)
    sub[sof_at + 11] = 0x33
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_baseline_jpeg(bytes(sub))


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 encode -> decode: 6 blocks per MCU (4 luma + 2 chroma),
    chroma box-downsampled then replicated back up.  Solid colors
    survive within quant error; smooth gradients within a few levels;
    the stream advertises 2x2 luma sampling on the wire."""
    import numpy as np

    from opensearch_spark.ops.jpegcodec import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    solid = np.full((16, 32, 3), [180, 90, 40], np.uint8)
    b = encode_baseline_jpeg(solid, subsampling="4:2:0")
    sof_at = b.find(b"\xff\xc0")
    assert b[sof_at + 11] == 0x22  # luma 2x2 on the wire
    assert b[sof_at + 14] == 0x11  # chroma 1x1
    dec = decode_baseline_jpeg(b)
    assert dec.shape == (16, 32, 3)
    assert np.abs(dec.astype(int) - solid.astype(int)).max() <= 3
    # 4:2:0 is smaller than 4:4:4 on chroma-heavy content
    assert len(b) < len(encode_baseline_jpeg(solid))

    y, x = np.mgrid[0:21, 0:19]  # non-multiple-of-16 dims: MCU padding
    grad = np.stack(
        [(x * 5) % 256, (y * 6) % 256, ((x + y) * 4) % 256], axis=2
    ).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(grad, subsampling="4:2:0"))
    assert dec.shape == grad.shape
    # luma stays tight; chroma averaged over 2x2 so allow more slack
    ygold = 0.299 * grad[..., 0] + 0.587 * grad[..., 1] + 0.114 * grad[..., 2]
    ydec = 0.299 * dec[..., 0] + 0.587 * dec[..., 1] + 0.114 * dec[..., 2]
    assert np.abs(ydec - ygold).mean() < 4.0
    assert np.abs(dec.astype(int) - grad.astype(int)).mean() < 10.0

    # grayscale ignores the flag (single component stream)
    g = ((x + y) * 4 % 256).astype(np.uint8)
    assert encode_baseline_jpeg(g, subsampling="4:2:0") == encode_baseline_jpeg(g)


def test_jpeg_feature_extraction_matches_pixels():
    """_decode_jpeg features == features recomputed from the decoded
    pixel array (same layout as BMP/PNG)."""
    import numpy as np

    from opensearch_spark.ops.jpegcodec import decode_baseline_jpeg
    from opensearch_spark.ops.multimodal import _decode_jpeg, decode_media, make_jpeg

    payload = make_jpeg(5, 3, w=16, h=16)
    feats = _decode_jpeg(payload)
    px = decode_baseline_jpeg(payload).astype(np.float64) / 255.0
    assert abs(feats[0] * 4096 - 16) < 1e-3
    assert abs(feats[2] - px[..., 0].mean()) < 1e-6
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert abs(feats[5] - luma.std()) < 1e-6
    assert np.allclose(decode_media(payload, "image/jpeg"), feats)


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn handling: insert a restart interval into the encoded
    stream layout by re-encoding with markers — decoder must reset DC
    predictors at each RSTn boundary."""
    import numpy as np

    from opensearch_spark.ops import jpegcodec as jc

    # encode with a restart interval by monkey-building: encode each
    # MCU row separately is intrusive; instead decode a stream we
    # construct by splicing DRI into a single-MCU-row image where the
    # interval never fires mid-stream (boundary correctness only)
    img = np.full((8, 32, 3), [10, 200, 90], np.uint8)
    data = bytearray(jc.encode_baseline_jpeg(img))
    sos_at = data.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x10"  # interval 16 > 4 MCUs: never fires
    data[sos_at:sos_at] = dri
    dec = jc.decode_baseline_jpeg(bytes(data))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
