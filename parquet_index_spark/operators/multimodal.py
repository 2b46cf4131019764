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


def chunk_audio(df: DataFrame, chunk_ms: int = 30_000,
                overlap_ms: int = 0, id_col: str = "media_id") -> DataFrame:
    """Chunking plan for audio rows: one output row per fixed-length
    window (optionally overlapping) — the standard pre-step for ASR or
    audio embedding at scale. Pure DataFrame math (sequence + explode):
    chunk boundaries come from duration_ms, so no decode happens here and
    nothing leaves the executors; the per-chunk waveform slice is the
    stubbed decoder step downstream. The final chunk is truncated at the
    clip end (chunk_end_ms <= duration_ms always holds)."""
    if not 0 <= overlap_ms < chunk_ms:
        raise ValueError(f"overlap_ms must be in [0, chunk_ms); got "
                         f"{overlap_ms} vs chunk_ms {chunk_ms}")
    stride = chunk_ms - overlap_ms
    dur = F.coalesce(F.col("duration_ms"), F.lit(0))
    # chunks start at 0, stride, 2*stride, ... while start < duration
    n_chunks = F.ceil(dur / F.lit(stride)).cast("int")
    return (df.filter(F.col("kind") == "audio")
            .filter(dur > 0)
            .select(F.col(id_col), F.col("duration_ms"),
                    F.explode(F.sequence(
                        F.lit(0), F.greatest(n_chunks - 1, F.lit(0))))
                    .alias("chunk_idx"))
            .withColumn("chunk_start_ms",
                        F.col("chunk_idx").cast("long") * stride)
            .filter(F.col("chunk_start_ms") < F.col("duration_ms"))
            .withColumn("chunk_end_ms",
                        F.least(F.col("chunk_start_ms") + chunk_ms,
                                F.col("duration_ms"))))


def resize_images(df: DataFrame, max_side: int = 512,
                  content_col: str = "content",
                  fake: bool = True) -> DataFrame:
    """Aspect-preserving image resize over Arrow batches.

    The TARGET-dimension math is real and runs as plain column arithmetic
    (scale = max_side / longest side, never upscale); only the pixel
    resample inside the mapInPandas batch is the stubbed decoder step —
    with ``fake=True`` the output bytes are a deterministic digest of
    (content, target dims) so downstream plumbing and tests behave exactly
    as with a real resampler. Output adds (out_width, out_height,
    resized_content); rows without dimensions pass through untouched
    (NULL outputs) rather than failing the batch.
    """
    if not fake:
        raise NotImplementedError(
            "Real image resampling requires imaging libraries not present "
            "in this environment; run with fake=True for the deterministic "
            "stand-in (same Spark plumbing).")

    scale = F.when(
        (F.col("width").isNotNull()) & (F.col("height").isNotNull())
        & (F.greatest("width", "height") > max_side),
        F.lit(float(max_side)) / F.greatest("width", "height")
    ).otherwise(F.lit(1.0))
    # unknown dimensions stay NULL end-to-end (greatest() would otherwise
    # turn greatest(1, NULL) into a bogus 1-pixel target)
    have_dims = F.col("width").isNotNull() & F.col("height").isNotNull()

    def target(side):
        return F.when(have_dims,
                      F.greatest(F.lit(1), F.floor(F.col(side) * scale))
                      .cast("int"))

    with_dims = (df.filter(F.col("kind") == "image")
                 .withColumn("out_width", target("width"))
                 .withColumn("out_height", target("height")))

    out_schema = T.StructType(with_dims.schema.fields +
                              [T.StructField("resized_content",
                                             T.BinaryType(), True)])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = []
            for content, w, h in zip(pdf[content_col], pdf["out_width"],
                                     pdf["out_height"]):
                if content is None or pd.isna(w) or pd.isna(h):
                    resized.append(None)
                else:
                    resized.append(hashlib.blake2b(
                        bytes(content) + f":{int(w)}x{int(h)}".encode(),
                        digest_size=16).digest())
            pdf = pdf.copy()
            pdf["resized_content"] = resized
            yield pdf

    return with_dims.mapInPandas(batches, schema=out_schema)
