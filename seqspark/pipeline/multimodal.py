"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (image/audio libraries are not in
this container): ``decode_image_batch`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder produces
stable metadata so the Spark-side plumbing — schema, batch iteration,
partitioning — is fully testable. Swap ``_fake_decode`` for a PIL/ffmpeg
call to go real; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a multimodal asset table
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("content", BinaryType()),
        StructField("meta_json", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder: derives (width, height, n_frames) from a
    digest so tests have stable expectations."""
    h = hashlib.sha256(content or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 + h[2] % 8
    return width, height, n_frames


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract binary assets via ``mapInPandas`` — Arrow
    batches keep the Python crossing amortized; output partitioning follows
    the input, so a downstream join back on asset_id is co-partitioned."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; not in this container"
                )
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                "sha256": pdf["content"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
            }
            decoded = pdf["content"].map(_fake_decode)
            out["width"] = decoded.map(lambda t: t[0])
            out["height"] = decoded.map(lambda t: t[1])
            out["n_frames"] = decoded.map(lambda t: t[2])
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per kept frame
    index — pure explode, runs JVM-side; the (stubbed) frame extraction
    would hang off frame_idx in a later mapInPandas."""
    return (
        decoded.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("asset_id", "frame_idx", "width", "height")
    )


def make_fake_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic asset fixture (binary payloads derived from the id)."""
    rows = []
    for i in range(n):
        content = hashlib.sha256(str(i).encode()).digest() * (1 + i % 4)
        media = ("image", "audio", "video")[i % 3]
        rows.append((i, media, bytearray(content), '{"src":"fixture"}'))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
