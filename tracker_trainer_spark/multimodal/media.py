"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference has no media path (SURVEY §2.10 north-star extension); this
module defines the Spark-side contract a 100 TB training-data pipeline
needs:

- **at rest**: `content binary` + a typed `meta` struct per kind — never
  decoded in storage, so scans that don't touch pixels stay columnar and
  cheap (column pruning drops `content` entirely when only metadata is
  queried);
- **decode / resize / feature-extract / frame-sample** run as
  Arrow-batched ``mapInPandas`` kernels: Spark moves binary batches to
  Python once per batch (not per row), the kernel vectorizes inside the
  batch, and output schemas are fixed up front so the optimizer can plan
  downstream operators;
- partitioning is preserved — every kernel is narrow (no shuffle);
  repartition *before* decode when pixel expansion (~100× the binary
  size for JPEG) would blow a partition past executor memory.

The pixel/sample **decode kernel itself is a deterministic STUB**
(`_fake_decode`): real image/audio codecs (PIL / libsndfile / ffmpeg)
are not in this container. The stub derives a small deterministic
"image" from the bytes' md5 so tests exercise real batch shapes, schema
evolution and partition behavior end-to-end. Swap `_decode_bytes` for a
PIL/ffmpeg call to go live — the Spark plumbing does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # 'image' | 'audio' | 'video'
    StructField("content", BinaryType()),       # opaque encoded payload
    StructField("meta", StructType([            # typed, kind-dependent
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("fps", DoubleType()),
        StructField("n_frames", IntegerType()),
    ])),
])

DECODED_IMAGE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("pixels", ArrayType(FloatType())),  # HWC row-major, [0,1]
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_index", IntegerType()),
    StructField("height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("pixels", ArrayType(FloatType())),
])

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("rms", DoubleType()),
    StructField("peak", DoubleType()),
    StructField("zero_crossings", LongType()),
])


# --------------------------------------------------------------------------
# STUB decode kernel — deterministic fake, clearly marked.
# Real implementation: PIL.Image.open(io.BytesIO(b)) / soundfile.read /
# ffmpeg frame extraction. Not available in this container.
# --------------------------------------------------------------------------

def _fake_decode(content: bytes, height: int, width: int, channels: int) -> np.ndarray:
    """Deterministic pixel fake, PORTABLE spelling (r7): pixels are an
    md5 chain over hex STRINGS — seed = md5(hex(content)); block j =
    md5(seed ':' j); pixel value = byte/256.  STAND-IN for a real
    codec.  Two properties are load-bearing:

    - portable: the same chain is expressible in ANSI SQL (md5 +
      substr + hex→int), which is what lets the driver hash-match the
      whole decode→feature mapInPandas plumbing against a DuckDB
      oracle (MEDIA_FEATURES_SQL) instead of a rows-only check;
    - dyadic: every value is k/256 (exactly representable), so pixel
      sums and sums of squares are EXACT in float64 — aggregation
      order can never flip a bit between engines.

    (The r6 spelling seeded numpy's PCG64 from the md5 — deterministic
    but inexpressible outside numpy, which forced the rows-only cert.)
    """
    n = height * width * channels
    seed_hex = hashlib.md5(bytes(content).hex().encode()).hexdigest()
    buf = b"".join(
        hashlib.md5(f"{seed_hex}:{j}".encode()).digest()
        for j in range((n + 15) // 16))
    arr = np.frombuffer(buf[:n], dtype=np.uint8)
    return (arr.astype(np.float32) / 256.0).reshape(height, width, channels)


def _decode_bytes(content: bytes, meta) -> np.ndarray:
    """Swap-point for a real codec. meta gives the typed dimensions."""
    h = int(meta["height"] or 8)
    w = int(meta["width"] or 8)
    c = int(meta["channels"] or 3)
    return _fake_decode(content, h, w, c)


# --------------------------------------------------------------------------
# Synthetic media table (testdata has no media files)
# --------------------------------------------------------------------------

def synthetic_media(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic media table: binary payload = md5-chained bytes.

    Built distributed (spark.range → expressions), not driver-side rows.
    """
    kind = (
        F.when(F.col("media_id") % 3 == 0, "image")
        .when(F.col("media_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    content = F.unhex(F.concat(*[
        F.md5(F.concat(F.col("media_id").cast("string"), F.lit(f":{i}")))
        for i in range(4)
    ]))  # 64 deterministic bytes per row
    meta = F.struct(
        (F.col("media_id") % 5 + 4).cast("int").alias("width"),
        (F.col("media_id") % 7 + 4).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        (F.col("media_id") * 100 + 1600).alias("n_samples"),
        F.lit(24.0).alias("fps"),
        (F.col("media_id") % 10 + 2).cast("int").alias("n_frames"),
    )
    return (
        spark.range(0, n, 1, partitions)
        .select(F.col("id").alias("media_id"), kind.alias("kind"),
                content.alias("content"), meta.alias("meta"))
    )


# --------------------------------------------------------------------------
# mapInPandas kernels — narrow, Arrow-batched, fixed output schemas
# --------------------------------------------------------------------------

def decode_images(df: DataFrame) -> DataFrame:
    """binary → decoded pixel rows (images only). Narrow mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "image":
                    continue
                px = _decode_bytes(r["content"], r["meta"])
                h, w, c = px.shape
                rows.append((r["media_id"], h, w, c, px.reshape(-1)))
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "channels", "pixels"]
            )

    return df.mapInPandas(kernel, DECODED_IMAGE_SCHEMA)


def resize_images(decoded: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize on decoded pixel rows (vectorized numpy).

    Nearest-neighbor is real (not stubbed): pure index math on the pixel
    array, no codec needed.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                h, w, c = int(r["height"]), int(r["width"]), int(r["channels"])
                px = np.asarray(r["pixels"], dtype=np.float32).reshape(h, w, c)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                resized = px[yi][:, xi]
                out.append((r["media_id"], out_h, out_w, c, resized.reshape(-1)))
            yield pd.DataFrame(
                out, columns=["media_id", "height", "width", "channels", "pixels"]
            )

    return decoded.mapInPandas(kernel, DECODED_IMAGE_SCHEMA)


def image_features(decoded: DataFrame) -> DataFrame:
    """Per-channel [means..., stds...] feature vector from decoded
    pixels.  std comes from the MOMENT identity sqrt(E[x²] − E[x]²),
    not np.std's two-pass mean-of-deviations: with dyadic pixel values
    (see `_fake_decode`) both Σx and Σx² are exact, so every feature is
    a fixed sequence of single-rounded IEEE ops — bit-reproducible by
    any engine that spells the same expression (the DuckDB oracle
    does)."""
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                c = int(r["channels"])
                px = np.asarray(r["pixels"], dtype=np.float64).reshape(-1, c)
                n = px.shape[0]
                s = px.sum(axis=0)          # exact (dyadic values)
                s2 = (px * px).sum(axis=0)  # exact (dyadic squares)
                mean = s / n
                std = np.sqrt(s2 / n - mean * mean)
                rows.append((r["media_id"], np.concatenate([mean, std])))
            yield pd.DataFrame(rows, columns=["media_id", "features"])

    return decoded.mapInPandas(kernel, schema)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: emit every n-th frame as a decoded row.

    1→many UDTF shape (same as the reference's E1 explode, but in a
    Pandas kernel because each output row needs a decoded payload).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    continue
                n_frames = int(r["meta"]["n_frames"] or 0)
                for idx in range(0, n_frames, every_n):
                    px = _decode_bytes(
                        bytes(r["content"]) + idx.to_bytes(4, "big"), r["meta"]
                    )
                    h, w, c = px.shape
                    rows.append((r["media_id"], idx, h, w, c, px.reshape(-1)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_index", "height", "width",
                         "channels", "pixels"],
            )

    return df.mapInPandas(kernel, FRAME_SCHEMA)


def audio_features(df: DataFrame) -> DataFrame:
    """RMS / peak / zero-crossing features over (stub-)decoded samples."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "audio":
                    continue
                n = min(int(r["meta"]["n_samples"] or 1600), 65536)
                seed = int.from_bytes(hashlib.md5(r["content"]).digest()[:8], "big")
                samples = np.random.default_rng(seed).uniform(-1, 1, n)  # STUB decode
                rows.append((
                    r["media_id"],
                    float(np.sqrt(np.mean(samples ** 2))),
                    float(np.max(np.abs(samples))),
                    int(np.sum(np.signbit(samples[1:]) != np.signbit(samples[:-1]))),
                ))
            yield pd.DataFrame(
                rows, columns=["media_id", "rms", "peak", "zero_crossings"]
            )

    return df.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)
