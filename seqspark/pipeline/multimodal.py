"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

``decode_assets(fake=True)`` (the CI default) runs a deterministic fake
decoder so the Spark-side plumbing — schema, batch iteration,
partitioning — is fully testable without media libraries.

``fake=False`` runs REAL kernels behind per-modality capability
detection, imported inside the executor batch function:

- image: Pillow (``PIL.Image``) when installed, else
  ``NotImplementedError``;
- audio: stdlib ``wave`` (WAV) — always available; decoded metadata maps
  (width, height, n_frames) → (channels, bits-per-sample, audio frames);
- video: no ffmpeg binding in this container → ``NotImplementedError``.
"""

from __future__ import annotations

import hashlib
import io
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


def _require_pil():
    """Capability probe for the Pillow-backed kernels (runs in the
    executor, so the import resolves against the worker's environment)."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "this kernel requires Pillow (pip install pillow)"
        ) from e
    return Image


def _real_decode(media_type: str, content: bytes) -> tuple[int, int, int]:
    """Real per-modality decode, capability-detected at call time."""
    if media_type == "image":
        Image = _require_pil()
        with Image.open(io.BytesIO(content or b"")) as img:
            return img.width, img.height, int(getattr(img, "n_frames", 1))
    if media_type == "audio":
        import wave

        with wave.open(io.BytesIO(content or b""), "rb") as w:
            return w.getnchannels(), w.getsampwidth() * 8, w.getnframes()
    raise NotImplementedError(f"no decoder for media_type={media_type!r}")


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract binary assets via ``mapInPandas`` — Arrow
    batches keep the Python crossing amortized; output partitioning follows
    the input, so a downstream join back on asset_id is co-partitioned."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                "sha256": pdf["content"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
            }
            if fake:
                decoded = pdf["content"].map(_fake_decode)
            else:
                # zip over the two columns directly — DataFrame.apply(axis=1)
                # builds a Series object per row, the slowest pandas loop
                decoded = pd.Series(
                    [
                        _real_decode(m, c)
                        for m, c in zip(pdf["media_type"], pdf["content"])
                    ],
                    index=pdf.index,
                )
            out["width"] = decoded.map(lambda t: t[0])
            out["height"] = decoded.map(lambda t: t[1])
            out["n_frames"] = decoded.map(lambda t: t[2])
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    assets: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize image assets to (width, height) via ``mapInPandas``.

    ``fake=True`` (CI default) emits a deterministic payload derived from
    the source bytes + target size, so schema/partitioning/batch shape are
    testable without Pillow; ``fake=False`` decodes and re-encodes PNG
    through Pillow (capability-detected in the executor)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["media_type"] == "image"]
            if len(pdf) == 0:
                continue

            if fake:
                def kernel(b: bytes) -> bytes:
                    seed = hashlib.sha256(
                        (b or b"") + f"{width}x{height}".encode()
                    ).digest()
                    return seed * (max(1, (width * height) // len(seed)))
            else:
                def kernel(b: bytes) -> bytes:
                    Image = _require_pil()
                    with Image.open(io.BytesIO(b or b"")) as img:
                        out = io.BytesIO()
                        img.resize((width, height)).save(out, format="PNG")
                        return out.getvalue()

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "content": pdf["content"].map(kernel),
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(batches, RESIZED_SCHEMA)


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
