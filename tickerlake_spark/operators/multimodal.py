"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Design for 100 TB multimodal corpora:
- the binary payload lives in a ``binary`` column (or an object-store URI
  column for >1 MB payloads); metadata is a typed struct so filters/joins
  prune on it without touching bytes;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  over Arrow record batches — the payload crosses into Python once per
  batch (zero-copy Arrow), is processed vectorized, and returns a narrow
  feature frame;
- the actual codec calls are STUBBED in this container (no PIL/ffmpeg):
  each kernel tries the real library import and otherwise applies a
  deterministic fake (documented per function) so the Spark-side plumbing —
  schema, batching, partitioning, UDF signatures — is real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "attach_fake_media",
    "extract_features",
    "resize_images",
    "sample_frames",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField("fmt", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_max", LongType()),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from a text corpus: payload = utf-8 bytes of the
    text (deterministic stand-in for real image/audio bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("data"),
        F.lit("raw").alias("fmt"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.length(text_col) * 10).cast("long").alias("duration_ms"),
    )


def _decode_stub(payload: bytes) -> list[int]:
    """STUB decode: real codecs are unavailable in this container.

    Tries Pillow for images; otherwise 'decodes' the payload to its raw
    byte values — deterministic, so tests and oracles can pin results.
    """
    try:  # pragma: no cover - PIL not installed in this container
        import io

        from PIL import Image

        return list(Image.open(io.BytesIO(payload)).tobytes())
    except ImportError:
        return list(payload)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item features via mapInPandas (Arrow-batched): byte count, mean
    and max of the decoded sample values.

    With a real decoder the kernel body is the only change; the plan shape
    (narrow projection in, narrow feature frame out) stays identical.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["data"].map(lambda b: _decode_stub(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": decoded.map(len).astype("int64"),
                    "feat_mean": decoded.map(
                        lambda v: float(sum(v)) / len(v) if v else 0.0
                    ),
                    "feat_max": decoded.map(lambda v: max(v) if v else 0).astype(
                        "int64"
                    ),
                }
            )

    narrow = media.select("media_id", "modality", "data")
    # spread: media tables are compute-bound in the kernel, and a small
    # parquet input would otherwise map to a single task
    narrow = narrow.repartition(
        narrow.sparkSession.sparkContext.defaultParallelism
    )
    return narrow.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: filters to images, runs the (stubbed) resize kernel,
    returns payload + updated dimensions. The stub truncates/pads bytes to
    width*height — a real PIL/opencv resize drops in without plan changes."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("data", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    target = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["data"].map(
                lambda b: bytes(b)[:target].ljust(target, b"\x00")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "data": resized,
                    "width": width,
                    "height": height,
                }
            )

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "data")
        .mapInPandas(kernel, out_schema)
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video: explodes each item into frame
    timestamps (0, every_ms, ...) capped by duration — pure SQL (the frame
    *extraction* would be the mapInPandas step; the schedule is not).
    """
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("duration_ms") - 1, F.lit(0).cast("long")),
        F.lit(every_ms).cast("long"),
    )
    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
