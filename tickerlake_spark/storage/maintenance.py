"""Table maintenance: small-file compaction.

Incremental pipelines (true ``mode("append")``, streaming sinks, dynamic
partition overwrite) accrete small files; at 100 TB the resulting
task-per-file scheduling and footer-read overhead dominates scan cost long
before data volume does. ``compact_table`` rewrites a Parquet table into
~``target_file_bytes`` files and atomically swaps it into place.

The reference never needed this — its writer is overwrite-only
(reference: storage/operations.py:35-38) so every write was already one
file. Real append semantics make compaction the necessary companion.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

__all__ = ["compact_table", "table_file_stats"]


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a Parquet table path (file or dir)."""
    if os.path.isfile(path):
        return 1, os.path.getsize(path)
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite ``path`` into ceil(total_bytes / target) files, atomically.

    Writes to a sibling temp dir, then swaps via rename — readers see either
    the old or the new table, never a partial one. (On an object store or a
    table format this becomes a metadata swap; the local-FS rename models the
    same contract.) Partition layout is intentionally NOT preserved: compact
    partitioned tables per-partition instead, or re-write with partitionBy.

    Returns {files_before, files_after, bytes}.
    """
    before_n, total = table_file_stats(path)
    if before_n < min_files_to_compact:
        return {"files_before": before_n, "files_after": before_n, "bytes": total}
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after_n, _ = table_file_stats(path)
    return {"files_before": before_n, "files_after": after_n, "bytes": total}
