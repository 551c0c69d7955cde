"""Multimodal-column queries: binary payload plumbing through mapInPandas.

The corpus is ASCII text re-encoded as binary payloads (deterministic), so
the stubbed decode (raw byte values) is SQL-mirrorable: DuckDB computes the
same features from character codes. What's under test is the real Arrow
batch path — schema in, mapInPandas kernel, narrow feature frame out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
    sample_frames,
)
from tickerlake_spark.plans.catalog import load_table, register


@register(
    "q54_media_features",
    doc="Multimodal feature extraction through mapInPandas (Arrow batches): "
    "binary payload in, (n_bytes, feat_mean, feat_max) out. Decode kernel "
    "is stubbed (no codecs in container) but deterministic, so the oracle "
    "recomputes it from character codes.",
    oracle="""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       ROUND(CAST(list_sum(list_transform(range(1, length(text) + 1),
                  i -> ord(substr(text, i, 1)))) AS DOUBLE)
             / length(text) + 5e-9, 6) AS feat_mean,
       CAST(list_max(list_transform(range(1, length(text) + 1),
            i -> ord(substr(text, i, 1)))) AS BIGINT) AS feat_max
FROM documents
""",
)
def q54_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        stable_round(F.col("feat_mean"), 6).alias("feat_mean"),
        "feat_max",
    )


@register(
    "q55_frame_sampling",
    doc="Video frame-sampling schedule: one row per (media, frame_ts) at a "
    "fixed stride, capped by duration — explode of a generated sequence.",
    oracle="""
SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_ts_ms
FROM documents,
     unnest(range(0, CAST(greatest(length(text) * 10 - 1, 0) AS BIGINT) + 1,
                  1000)) AS t(f)
WHERE doc_id % 3 = 2
""",
)
def q55_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, every_ms=1000)
