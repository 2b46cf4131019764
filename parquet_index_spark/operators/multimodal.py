"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schema, partition-preserving
mapInPandas, Arrow batch shapes, typed metadata. Two content modes:

- ``fake=True``: a deterministic digest/feature stand-in derived from the
  bytes, so the distributed plumbing (and its tests) exercises the same
  code path a real decoder would, on arbitrary opaque bytes.
- ``fake=False``: REAL pure-numpy pixel work over a documented raw-raster
  contract — ``content`` is a row-major uint8 raster of shape
  (height, width, channels), channels inferred from len(content) /
  (width*height) and required to be 1, 3 or 4. Bilinear resampling and
  channel-statistics features run vectorized inside the Arrow batch.
  Compressed formats (JPEG/PNG/MP3) are out of scope — decoding them
  needs codec libraries not present in this container; rows whose bytes
  don't match the raster contract yield NULL outputs rather than failing
  the batch.

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


def _decode_raster(content: bytes, width, height):
    """Raw-raster contract: bytes -> uint8 array (H, W, C) or None.

    None (not an exception) when dimensions are missing or the byte count
    is not an integer 1/3/4-channel multiple of width*height — a bad row
    must not fail its whole Arrow batch."""
    if content is None or width is None or height is None:
        return None
    w, h = int(width), int(height)
    if w <= 0 or h <= 0:
        return None
    buf = np.frombuffer(content, dtype=np.uint8)
    if buf.size == 0 or buf.size % (w * h) != 0:
        return None
    c = buf.size // (w * h)
    if c not in (1, 3, 4):
        return None
    return buf.reshape(h, w, c)


def _resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pure-numpy bilinear resample of an (H, W, C) uint8 raster.

    Pixel-center sampling (the OpenCV/PIL convention): output pixel i
    samples source coordinate (i + 0.5) * scale - 0.5, edges clamped.
    Fully vectorized — one gather + three lerps per batch image, no
    Python per-pixel loop."""
    h, w, _c = img.shape
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    x0f, y0f = np.floor(xs), np.floor(ys)
    wx = np.clip(xs - x0f, 0.0, 1.0)[None, :, None]
    wy = np.clip(ys - y0f, 0.0, 1.0)[:, None, None]
    x0 = np.clip(x0f.astype(np.int64), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y0 = np.clip(y0f.astype(np.int64), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    img_f = img.astype(np.float32)
    top = img_f[y0][:, x0] * (1 - wx) + img_f[y0][:, x1] * wx
    bot = img_f[y1][:, x0] * (1 - wx) + img_f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _raster_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real content features from a raster: per-channel mean/std plus a
    luminance histogram, L2-normalized and fitted to ``dim``."""
    img_f = img.astype(np.float32)
    chan = np.concatenate([img_f.mean(axis=(0, 1)) / 255.0,
                           img_f.std(axis=(0, 1)) / 255.0])
    lum = img_f.mean(axis=2).ravel()
    n_bins = max(dim - chan.size, 1)
    hist, _ = np.histogram(lum, bins=n_bins, range=(0.0, 255.0))
    hist = hist.astype(np.float32) / max(lum.size, 1)
    v = np.concatenate([chan, hist])[:dim]
    if v.size < dim:
        v = np.pad(v, (0, dim - v.size))
    norm = np.linalg.norm(v)
    return (v / norm if norm > 0 else v).astype(np.float32)


def extract_features(df: DataFrame, content_col: str = "content",
                     dim: int = 16, fake: bool = True) -> DataFrame:
    """Per-item feature extraction over Arrow batches (mapInPandas).

    Output schema = input schema + features array<float>. With fake=False
    the content is decoded under the raw-raster contract (see module
    docstring; requires width/height columns) and features are real
    channel statistics + luminance histogram; the batch iteration, schema
    handling, and partitioning are identical in both modes.
    """
    if not fake and not {"width", "height"} <= set(df.columns):
        raise ValueError(
            "extract_features(fake=False) decodes the raw-raster contract "
            "and needs width/height columns (MEDIA_SCHEMA) to shape the "
            "buffer.")

    out_schema = T.StructType(df.schema.fields +
                              [T.StructField("features",
                                             T.ArrayType(T.FloatType()), True)])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                feats = [
                    None if content is None else
                    _fake_features(bytes(content), dim).tolist()
                    for content in pdf[content_col]
                ]
            else:
                feats = []
                for content, w, h in zip(pdf[content_col], pdf["width"],
                                         pdf["height"]):
                    img = None if content is None or pd.isna(w) or pd.isna(h) \
                        else _decode_raster(bytes(content), w, h)
                    feats.append(None if img is None
                                 else _raster_features(img, dim).tolist())
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

    The TARGET-dimension math runs as plain column arithmetic
    (scale = max_side / longest side, never upscale). The pixel resample
    inside the mapInPandas batch has two modes: ``fake=False`` performs a
    REAL pure-numpy bilinear resample under the raw-raster contract
    (module docstring), emitting the resized raster's bytes; ``fake=True``
    emits a deterministic digest of (content, target dims) for opaque
    bytes, so downstream plumbing and tests behave identically. Output
    adds (out_width, out_height, resized_content); rows without
    dimensions — or, under fake=False, with non-raster bytes — pass
    through with NULL outputs rather than failing the batch.
    """

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
            for content, w, h, ow, oh in zip(
                    pdf[content_col], pdf["width"], pdf["height"],
                    pdf["out_width"], pdf["out_height"]):
                if content is None or pd.isna(ow) or pd.isna(oh):
                    resized.append(None)
                elif fake:
                    resized.append(hashlib.blake2b(
                        bytes(content) + f":{int(ow)}x{int(oh)}".encode(),
                        digest_size=16).digest())
                else:
                    img = _decode_raster(bytes(content), w, h)
                    resized.append(
                        None if img is None else
                        _resize_bilinear(img, int(ow), int(oh)).tobytes())
            pdf = pdf.copy()
            pdf["resized_content"] = resized
            yield pdf

    return with_dims.mapInPandas(batches, schema=out_schema)
