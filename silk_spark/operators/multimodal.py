"""Multimodal column plumbing: image/audio/video as opaque binary.

The decode/feature libraries (PIL, torchaudio, ffmpeg) are NOT in this
container, so the decode kernels are stubbed behind
``NotImplementedError`` or a deterministic fake — but the Spark-side
contract IS real and tested: schemas, Arrow batch shapes,
``mapInPandas`` partitioning, and metadata pushdown all behave exactly
as they would with real codecs dropped in.

Design for 100 TB: binaries ride in parquet as ``binary`` columns with
typed metadata alongside (width/height/sample_rate/...), so metadata
predicates prune at the scan WITHOUT touching blob bytes (column
pruning keeps the binary column unread until a decode stage needs it).
Decode stages are ``mapInPandas`` — one Arrow batch in, one out,
bounded memory via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

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

IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("data", BinaryType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("feat_dim", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("data", BinaryType()),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: blob bytes derived from the id
    (md5 chain), realistic metadata. Stands in for a real image store."""
    df = spark.range(0, n, 1)
    blob = F.unhex(F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 4))
    return df.select(
        F.col("id").alias("media_id"),
        blob.alias("data"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
            (F.pmod(F.xxhash64(F.lit(seed + 1), F.col("id")), F.lit(3)) + 1).cast("int"),
        ).alias("format"),
        (F.pmod(F.xxhash64(F.lit(seed + 2), F.col("id")), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.lit(seed + 3), F.col("id")), F.lit(1080)) + 1).cast("int").alias("height"),
    )


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic stand-in for image decode + embed: 8 floats from
    the blob bytes. Replace with PIL/torch decode on a real cluster."""
    if data is None:
        return []
    return [b / 255.0 for b in data[:8]]


def extract_image_features(df: DataFrame, real_decoder=None) -> DataFrame:
    """mapInPandas feature extraction. `real_decoder` slots in a real
    (PIL/torch) kernel; default uses the deterministic fake so the
    distributed plumbing is testable in this container."""
    decoder = real_decoder or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["data"].map(decoder)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feat_dim": feats.map(len).astype("int32"),
                }
            )

    return df.mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: real codecs are not in this image. The Spark
    contract (schema/batching) is final; the kernel raises."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires PIL/opencv, not present in this container; "
            "plug a kernel into the mapInPandas closure"
        )
        yield  # pragma: no cover

    return df.mapInPandas(batches, IMAGE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Video frame sampling stub with REAL fan-out plumbing: each media
    row yields `max_frames` frame rows (deterministic fake frame bytes);
    a real ffmpeg kernel replaces `_fake_frame` only."""

    def _fake_frame(data: bytes, idx: int) -> bytes:
        return bytes([(b + idx) % 256 for b in (data or b"")[:16]])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "data": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                for k in range(max_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k * every_n)
                    rows["data"].append(_fake_frame(data, k * every_n))
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, FRAME_SCHEMA)
