"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode kernels themselves are STUBBED (image/audio libraries are not
available in this environment — see ``set_decoder`` to plug real ones
in); everything Spark-side is real and tested: schemas, batching,
partition sizing, UDF signatures, and the deterministic fake decoder
used by tests.

Design for 100 TB of media: binary payloads stay columnar (parquet/
Iceberg binary columns read with spark.sql.files.maxPartitionBytes sized
so one task holds a few hundred MB of payload); decode is a mapInPandas
pass so each Arrow batch amortizes kernel startup; features come back as
fixed-length array<float> columns that downstream similarity.py can
index directly.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

FEATURE_DIM = 64

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed kernel: a seeded
    byte-histogram projection. Replace via set_decoder() in production
    (the real kernel would decode with PIL/ffmpeg and run a vision/audio
    encoder). Raises NotImplementedError for unknown kinds, marking the
    genuine stub boundary."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(
        np.float64
    )
    norm = np.linalg.norm(hist)
    return (hist / norm if norm > 0 else hist).astype(np.float32)


_DECODER: Callable[[bytes, str], np.ndarray] = _fake_decode


def set_decoder(fn: Callable[[bytes, str], np.ndarray]) -> None:
    global _DECODER
    _DECODER = fn


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas decode/feature pass: binary payload → array<float>.

    One Arrow batch per kernel invocation group; payload bytes never
    surface to the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _DECODER(bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: explode per-video sample timestamps
    (decode itself is the stubbed kernel). Demonstrates the fan-out shape:
    one row per (video, frame_ts)."""
    n_frames = (F.coalesce(F.col("meta_duration_ms"), F.lit(0)) / every_ms).cast(
        "int"
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image resize kernel (PIL not
    available): truncate/tile the byte stream to w*h bytes so output
    size is exactly the resized raster's. Replace alongside
    set_decoder() in production."""
    target = w * h
    reps = (target // max(len(payload), 1)) + 1
    return (payload * reps)[:target]


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """mapInPandas image-resize pass (stub kernel, real plumbing): only
    image rows are decoded; payload bytes stay executor-side and the
    output is again a typed binary column downstream stages can chain
    (resize → extract_features is the standard preprocessing pipeline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "payload": [
                        _fake_resize(bytes(p), width, height)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, RESIZED_SCHEMA
    )


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    import hashlib

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(
            f"media{i}".encode(), digest_size=64, key=b"mm"
        ).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                5000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
