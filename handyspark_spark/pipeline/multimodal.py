"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The container has no image/audio codecs, so DECODE IS STUBBED (raises
``NotImplementedError`` unless ``fake=True`` requests the deterministic
fake decoder) — but everything Spark-side is real and tested: the media
schema, binary-column construction, Arrow batch shape through
``mapInPandas``, partition-sized batching, and feature-column contracts.
Swapping the stub for PIL/ffmpeg changes one function body, not the plan.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("format", T.StringType()),     # png | wav | mp4 | ...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])


def attach_fake_media(df: DataFrame, id_col: str, payload_col: str,
                      kind: str = "image") -> DataFrame:
    """Build a deterministic binary media column from any string column —
    the test stand-in for real blobs (byte content = utf-8 payload)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(payload_col), "utf-8").alias("data"),
        F.struct(
            F.lit(kind).alias("kind"), F.lit("raw").alias("format"),
            F.lit(32).alias("width"), F.lit(32).alias("height"),
            F.lit(1).alias("n_frames"), F.lit(16000).alias("sample_rate"),
        ).alias("meta"))


def _decode(data: bytes, meta, fake: bool):
    """STUB: real decode needs PIL/libsndfile/ffmpeg (not in this
    container). The deterministic fake derives a pixel array from the md5
    of the bytes so downstream feature code is fully exercised."""
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio codec not present in "
            "this environment; pass fake=True for the deterministic stub")
    h = hashlib.md5(data or b"").digest()
    rng = np.frombuffer((h * 8)[:64], dtype=np.uint8)
    return rng.reshape(8, 8).astype(np.float32)


def media_features(df: DataFrame, n_features: int = 8,
                   fake: bool = True) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches, one
    python worker pass, no shuffle). Output: media_id, byte_len, sha256,
    features array<float>."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, lens, hashes = [], [], []
            for data in pdf["data"]:
                b = bytes(data) if data is not None else b""
                lens.append(len(b))
                hashes.append(hashlib.sha256(b).hexdigest())
                px = _decode(b, None, fake)
                # pooled fake features: row means of the pixel block
                feats.append(px.mean(axis=1)[:n_features].tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "byte_len": lens, "sha256": hashes,
                                "features": feats})

    return df.select("media_id", "data").mapInPandas(batches, out_schema)


def resize_images(df: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """Resize stub: plumbing (schema/meta update) is real, pixel work is
    the deterministic fake."""
    if not fake:
        raise NotImplementedError("real resize requires PIL")
    return df.withColumn(
        "meta",
        F.struct(F.col("meta.kind").alias("kind"),
                 F.col("meta.format").alias("format"),
                 F.lit(width).alias("width"),
                 F.lit(height).alias("height"),
                 F.col("meta.n_frames").alias("n_frames"),
                 F.col("meta.sample_rate").alias("sample_rate")))


def sample_frames(df: DataFrame, every_n: int = 10,
                  fake: bool = True) -> DataFrame:
    """Frame-sampling stub for video kind: emits (media_id, frame_idx,
    frame_bytes) — real plumbing via posexplode over a generated index."""
    if not fake:
        raise NotImplementedError("real frame extraction requires ffmpeg")
    idx = F.sequence(F.lit(0),
                     F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                     F.lit(every_n))
    return (df.select("media_id", F.explode(idx).alias("frame_idx"),
                      F.col("data"))
            .withColumn("frame_bytes",
                        F.sha2(F.concat(
                            F.col("data"),
                            F.encode(F.col("frame_idx").cast("string"),
                                     "utf-8")), 256))
            .drop("data"))
