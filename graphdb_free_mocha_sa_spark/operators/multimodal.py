"""Multimodal (image/audio/video) column plumbing (E4).

Media are opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
UDFs. The codec libraries aren't in this container, so the actual decode is
STUBBED: ``decode= "real"`` raises NotImplementedError at the call site,
``decode="fake"`` is a deterministic content-hash-seeded fake that keeps the
Spark-side plumbing (schema, batching, partitioning) fully real and testable.

Scale notes: binary payloads never shuffle — all per-media operators are
narrow (mapInPandas over the scan); only extracted features (small fixed-size
vectors) flow into joins/aggregations downstream.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("content", BinaryType()),        # opaque payload
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("codec", StringType()),
    ])),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("n_bytes", LongType()),
])


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 64), dtype=np.uint8).tobytes()
        meta = (64, 48, None, None, "png") if kind == "image" else \
               (None, None, 16000, None, "pcm") if kind == "audio" else \
               (64, 48, None, 120, "h264")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: hash-seeded vector."""
    seed = int.from_bytes(content[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    return np.random.default_rng(seed).standard_normal(FEATURE_DIM).astype(np.float32)


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Per-media feature vectors via Arrow-batched mapInPandas.

    ``decode="real"`` marks where PIL/librosa/pyav would run —
    NotImplementedError here by design (libs not in container)."""
    if decode == "real":
        raise NotImplementedError(
            "real media decode requires PIL/librosa/pyav (not in this container); "
            "use decode='fake' for plumbing tests")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [list(map(float, _fake_feature(bytes(c)))) for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": pdf["content"].map(len).astype("int64"),
            })

    return media.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("content", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def resize_images(media: DataFrame, width: int, height: int,
                  decode: str = "fake") -> DataFrame:
    """Image resize plumbing; fake path truncates/pads the payload to w*h."""
    if decode == "real":
        raise NotImplementedError("real image resize requires PIL (not in container)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = width * height
        for pdf in batches:
            out = [bytes(c)[:size].ljust(size, b"\0") for c in pdf["content"]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "content": [bytearray(o) for o in out],
                                "width": width, "height": height})

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 30,
                  decode: str = "fake") -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index."""
    if decode == "real":
        raise NotImplementedError("real frame sampling requires pyav (not in container)")
    vids = media.filter((F.col("kind") == "video") & F.col("meta.n_frames").isNotNull())
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx"))
