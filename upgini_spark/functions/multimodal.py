"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real — typed metadata schema, Arrow-batched
``mapInPandas`` kernels, partition sizing — while the actual media decode
is stubbed: the container has no image/audio libraries, so decoders
either raise ``NotImplementedError`` (strict mode) or produce a
deterministic fake derived from the bytes (test mode). Swapping in a real
decoder is a one-function change; schemas and batch shapes don't move.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), False),   # image | audio | video
    StructField("content", BinaryType(), True),        # opaque payload
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_DIM = 16

_FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), False),
    StructField("n_bytes", IntegerType(), True),
    StructField("content_sha256", StringType(), True),
    StructField("features", ArrayType(FloatType()), True),
])


def _fake_decode_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake embedding from the payload bytes (test mode).
    A real decoder (PIL/librosa/ffmpeg) replaces ONLY this function."""
    if content is None:
        return None
    digest = hashlib.sha256(content).digest()
    need = dim * 2
    buf = (digest * ((need // len(digest)) + 1))[:need]
    return [
        int.from_bytes(buf[2 * i: 2 * i + 2], "big") / 65535.0 for i in range(dim)
    ]


def extract_media_features(
    df: DataFrame, strict: bool = False, batch_size_hint: int = 256
) -> DataFrame:
    """Decode/feature-extract media rows via ``mapInPandas``.

    Arrow moves the binary column in batches (cap
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` low for large media —
    batch bytes ≈ records x media size). ``strict=True`` raises
    NotImplementedError where a real decoder is required — the clearly
    marked stub boundary.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires an image/audio library not present "
                    "in this container; plug a real decoder into "
                    "_fake_decode_features"
                )
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else None),
                "content_sha256": pdf["content"].map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                ),
                "features": pdf["content"].map(_fake_decode_features),
            })
            out["n_bytes"] = out["n_bytes"].astype("Int32")
            yield out

    return df.mapInPandas(kernel, schema=_FEATURE_SCHEMA)


def synthetic_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (payload =
    repeated md5 bytes; sizes vary by row hash)."""
    df = spark.range(n_rows)
    i = F.col("id")
    h = F.abs(F.xxhash64(i, F.lit(seed)))
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (h % 3 + 1).cast("int")
    )
    # repeat factor from the plain row id (portable to any SQL oracle)
    payload = F.to_binary(
        F.repeat(F.md5(i.cast("string")), (i % 8 + 1).cast("int")), F.lit("utf-8")
    )
    return df.select(
        F.format_string("m%09d", i).alias("media_id"),
        mtype.alias("media_type"),
        payload.alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        (h % 1920 + 1).cast("int").alias("width"),
        (h % 1080 + 1).cast("int").alias("height"),
        (h % 60000).cast("int").alias("duration_ms"),
    )
