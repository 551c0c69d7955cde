"""Keyed upsert (MERGE) into a Parquet table — last-write-wins on key.

The lakehouse primitive the reference's overwrite-only writer (reference:
storage/operations.py:35-38) could not express: apply a batch of row-level
updates/inserts without rewriting unrelated data.

Semantics: for each key in ``updates``, the stored row is replaced; keys not
present are appended. Equivalent to ``MERGE INTO t USING u ON keys WHEN
MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *``.

Scale posture:
- **Unpartitioned tables** are rewritten via anti-join + union + atomic swap
  — correct but O(table). Fine for dimension-sized tables.
- **Partitioned tables** rewrite ONLY the partitions the update batch
  touches (Spark dynamic partition overwrite): the anti-join reads just
  those partitions (partition pruning from the touched-values semi join) and
  untouched partitions are never scanned or written. This is the 100 TB
  path — cost scales with the update's partition footprint, not table size.
- The updates side of the anti-join is broadcast when small (Catalyst/AQE
  decides); a billion-row update batch degrades gracefully to a shuffle
  join on the key.

On an object store / table format the swap and partition replacement become
metadata commits; the local-FS rename models the same atomicity contract.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.storage.io import table_exists, write_table

__all__ = ["upsert_table"]


def upsert_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_by: str | None = None,
    validate_unique: bool = True,
) -> dict:
    """MERGE ``updates`` into the Parquet table at ``path`` on ``keys``.

    ``updates`` must be unique on ``keys`` (checked when ``validate_unique``
    — one extra keys-only aggregation; disable for very large batches where
    the producer already guarantees uniqueness). Returns
    {"inserted_or_updated": n, "mode": ...}.
    """
    if validate_unique:
        dup = (
            updates.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(f"updates are not unique on {keys}")

    n_updates = updates.count()
    if not table_exists(path):
        write_table(updates, path, partition_by=partition_by)
        return {"inserted_or_updated": n_updates, "mode": "create"}

    existing = spark.read.parquet(path)
    if partition_by is None:
        key_set = updates.select(*keys)
        merged = existing.join(key_set, keys, "left_anti").unionByName(updates)
        tmp = f"{path.rstrip('/')}__upsert_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        return {"inserted_or_updated": n_updates, "mode": "rewrite"}

    # Partitioned: rebuild only the touched partitions, then dynamic-overwrite
    # them. The isin filter prunes the existing scan to those partitions.
    touched = [
        r[0] for r in updates.select(partition_by).distinct().collect()
    ]
    survivors = (
        existing.filter(F.col(partition_by).isin(touched))
        .join(updates.select(*keys), keys, "left_anti")
    )
    merged = survivors.unionByName(updates.select(*survivors.columns))
    # Spark refuses to overwrite a path that feeds the same plan: stage the
    # merged partitions to a temp dir first (they are only the touched
    # partitions — small), then dynamic-overwrite from the staged copy.
    tmp = f"{path.rstrip('/')}__upsert_{uuid.uuid4().hex[:8]}"
    merged.write.parquet(tmp)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            spark.read.parquet(tmp)
            .write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "inserted_or_updated": n_updates,
        "mode": "dynamic-partition",
        "touched_partitions": len(touched),
    }
