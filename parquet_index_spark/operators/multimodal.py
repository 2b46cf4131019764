"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schema, partition-preserving
mapInPandas, Arrow batch shapes, typed metadata — while the actual media
decoding is stubbed (image/audio libraries are not in this container):

- ``decode_image`` raises NotImplementedError by design when
  ``fake=False``; with ``fake=True`` it produces a deterministic feature
  vector derived from the bytes, so the distributed plumbing (and its
  tests) exercise the same code path a real decoder would.

Scale design: media bytes never pass through the driver; mapInPandas
processes Arrow record batches per partition, and feature extraction adds
columns rather than materializing intermediate blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("codec", T.StringType(), True),
])


def attach_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata columns derivable without decoding: byte size + md5."""
    return (df.withColumn("content_bytes", F.length(F.col(content_col)))
            .withColumn("content_md5", F.md5(F.col(content_col))))


def _fake_features(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes -> unit vector."""
    seed_bytes = hashlib.blake2b(content or b"", digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(seed_bytes, "big"))
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_features(df: DataFrame, content_col: str = "content",
                     dim: int = 16, fake: bool = True) -> DataFrame:
    """Per-item feature extraction over Arrow batches (mapInPandas).

    Output schema = input schema + features array<float>. With fake=False
    this is where a real decode (PIL/ffmpeg/torchvision) plugs in; the
    batch iteration, schema handling, and partitioning are identical.
    """
    if not fake:
        raise NotImplementedError(
            "Real media decoding requires image/audio libraries not present "
            "in this environment; run with fake=True for the deterministic "
            "stand-in (same Spark plumbing).")

    out_schema = T.StructType(df.schema.fields +
                              [T.StructField("features",
                                             T.ArrayType(T.FloatType()), True)])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                None if content is None else
                _fake_features(bytes(content), dim).tolist()
                for content in pdf[content_col]
            ]
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  id_col: str = "media_id") -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the decode of each frame is the stubbed step). Pure
    DataFrame explode — the expensive part stays distributed."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms) \
        .cast("int")
    return (df.filter(F.col("kind") == "video")
            .select(F.col(id_col), F.col("duration_ms"),
                    F.explode(
                        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
                    ).alias("frame_idx"))
            .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms))
