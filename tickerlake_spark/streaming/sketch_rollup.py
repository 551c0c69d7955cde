"""Streaming distinct-count maintenance: per-micro-batch HLL sketch merge.

The streaming face of ``operators/incremental_agg``'s persisted-sketch
rollup: each micro-batch's values are sketched (one map-side-combined agg
over the batch only) and HLL-unioned into the stored per-group rollup via
a keyed upsert — history is never rescanned, per-group state is O(1), and
the served estimate is bit-identical to sketching the whole stream in one
batch pass (associative union; gated by ``tests/test_streaming.py``).

Delivery semantics caveat: HLL union is idempotent for REPLAYED IDENTICAL
rows (re-inserting an element already in the sketch is a no-op), so a
foreachBatch replay after a crash converges — the same effectively-once
argument as the medallion upserts, and strictly stronger than a count-based
rollup would get (counts double on replay; sketches don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tickerlake_spark.operators.incremental_agg import (
    kmv_delta,
    kmv_merge,
    merge_distinct_sketches,
    sketch_distinct_delta,
)
from tickerlake_spark.storage.io import table_exists
from tickerlake_spark.storage.upsert import upsert_table

__all__ = [
    "sketch_rollup_batch",
    "stream_distinct_rollup",
    "kmv_rollup_batch",
    "stream_kmv_rollup",
]


def sketch_rollup_batch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    keys: list[str],
    col: str,
    lgk: int = 12,
) -> None:
    """Fold one micro-batch into the persisted per-``keys`` sketch rollup.

    The stored rollup is SEMI-JOINED to the delta's keys before the merge,
    so both the HLL union and the subsequent upsert carry only the groups
    this batch touched — merging the whole stored table each micro-batch
    (ADVICE r4) would make every batch O(all groups) and contradict the
    touch-only-changed-groups posture. Untouched groups are left on disk
    unread; ``upsert_table`` keeps their rows as-is.
    """
    if batch.isEmpty():
        return
    delta = sketch_distinct_delta(batch, keys, col, lgk=lgk)
    if table_exists(path):
        touched = (
            spark.read.parquet(path)
            .join(delta.select(*keys), keys, "left_semi")
        )
        delta = merge_distinct_sketches(touched, delta, keys)
    upsert_table(spark, path, delta, keys=keys, validate_unique=False)


def kmv_rollup_batch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    keys: list[str],
    col: str,
    k: int = 2048,
) -> None:
    """Fold one micro-batch into a persisted per-``keys`` KMV sketch — the
    CROSS-ENGINE-VERIFIABLE sibling of :func:`sketch_rollup_batch` (see
    ``operators/incremental_agg.py``'s KMV section). The sketch for a
    group is its k smallest distinct hashes (multiple rows per group), so
    the upsert keyed on the GROUP columns replaces each touched group's
    row set wholesale — hashes that fell out of the top-k must not
    survive. Same touched-groups-only discipline as the HLL path; replay
    of an already-folded batch merges to the identical sketch (set union
    is idempotent)."""
    if batch.isEmpty():
        return
    delta = kmv_delta(batch, keys, col, k=k)
    if table_exists(path):
        touched = spark.read.parquet(path).join(
            delta.select(*keys).distinct(), keys, "left_semi"
        )
        delta = kmv_merge(touched, delta, keys, k=k)
    upsert_table(spark, path, delta, keys=keys, validate_unique=False)


def stream_kmv_rollup(
    spark: SparkSession,
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    keys: list[str],
    col: str,
    k: int = 2048,
    available_now: bool = True,
):
    """foreachBatch wrapper over ``kmv_rollup_batch``; serve estimates
    with ``operators.incremental_agg.kmv_estimates`` over ``path``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        kmv_rollup_batch(batch_df.sparkSession, path, batch_df, keys, col, k)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_distinct_rollup(
    spark: SparkSession,
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    keys: list[str],
    col: str,
    lgk: int = 12,
    available_now: bool = True,
):
    """foreachBatch wrapper over ``sketch_rollup_batch``; serve estimates
    with ``operators.incremental_agg.sketch_estimates`` over ``path``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        sketch_rollup_batch(batch_df.sparkSession, path, batch_df, keys, col, lgk)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
