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

__all__ = [
    "compact_table",
    "compact_ingest_partitions",
    "compact_partition_dirs",
    "table_file_stats",
    "swap_partition_dir",
    "repair_partition_swaps",
]


# ---------------------------------------------------------------------------
# Journaled partition-dir swap (ADVICE r8 medium): the naive two-rename swap
# (part -> _old_x, _tmp_y -> part) has a crash window in which the bucket's
# entire history sits in a '_'-prefixed dir INVISIBLE to Spark readers — a
# retrying maintenance job would then see an empty/absent bucket and
# silently recreate it from the delta alone, permanently losing history.
# Every swap therefore journals its intent to a '_swap_*.json' marker in the
# table root BEFORE the first rename; maintenance entry points call
# repair_partition_swaps first, which deterministically finishes (or rolls
# forward) any interrupted swap from the marker. Markers and staging dirs
# are '_'-prefixed, so Spark scans never parse them as partitions.
# ---------------------------------------------------------------------------


def swap_partition_dir(
    path: str, part_name: str, tmp_dir: str, delete: bool = False
) -> None:
    """Atomically-journaled replacement of one ``col=value`` partition dir.

    ``tmp_dir`` must be a fully-written '_'-prefixed sibling inside
    ``path`` (or may be absent when ``delete=True`` — the intent is then
    to remove the partition). Sequence: marker in -> old out -> tmp in ->
    old deleted -> marker out. A crash at ANY point is repaired by
    ``repair_partition_swaps`` from the marker alone.
    """
    import json

    swap_id = uuid.uuid4().hex[:8]
    marker = os.path.join(path, f"_swap_{swap_id}.json")
    old_name = f"_old_{swap_id}"
    payload = {
        "part": part_name,
        "tmp": os.path.basename(tmp_dir),
        "old": old_name,
        "delete": bool(delete),
    }
    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_marker, marker)
    # the journal ordering must survive POWER loss, not just a process
    # crash: without a directory fsync the filesystem may persist the
    # part -> _old rename while the marker's own rename is still
    # unflushed, leaving an unrecoverable markerless _old_* dir — fsync
    # the table dir after the marker lands and again after the swap
    _fsync_dir(path)
    _finish_swap(path, payload)
    _fsync_dir(path)
    os.remove(marker)


def _fsync_dir(path: str) -> None:
    """Flush directory-entry changes (renames, creates) to stable storage.
    Best-effort on filesystems that reject directory fds."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def _finish_swap(path: str, m: dict) -> None:
    """Run (or re-run) a journaled swap to completion. Idempotent: safe to
    call on any intermediate state the crash windows can produce."""
    part = os.path.join(path, m["part"])
    tmp = os.path.join(path, m["tmp"])
    old = os.path.join(path, m["old"])
    if m.get("delete"):
        # intent: partition removed (rename out of Spark's view, then delete
        # — a partially-rmtree'd live dir would be readable as corrupt)
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.isdir(part):
            if os.path.isdir(old):
                shutil.rmtree(old)
            os.rename(part, old)
        shutil.rmtree(old, ignore_errors=True)
        return
    if os.path.isdir(tmp):
        if os.path.isdir(part):
            if os.path.isdir(old):
                shutil.rmtree(old)
            os.rename(part, old)
        os.rename(tmp, part)
    elif not os.path.isdir(part) and os.path.isdir(old):
        # defensive: staged data lost mid-swap — restore the original
        os.rename(old, part)
    shutil.rmtree(old, ignore_errors=True)


def repair_partition_swaps(path: str) -> int:
    """Finish every swap a crashed maintenance run left journaled in
    ``path``'s root. Returns the number of markers repaired. Called at the
    top of every partition-dir maintenance entry point; also usable
    standalone after a crash."""
    import json

    if not os.path.isdir(path):
        return 0
    repaired = 0
    for name in sorted(os.listdir(path)):
        if not (name.startswith("_swap_") and name.endswith(".json")):
            continue
        marker = os.path.join(path, name)
        with open(marker) as f:
            m = json.load(f)
        _finish_swap(path, m)
        os.remove(marker)
        repaired += 1
    return repaired


def compact_partition_dirs(
    spark: SparkSession,
    path: str,
    max_files_per_partition: int = 16,
    sort_by: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compact ONLY the partition directories of a Hive-partitioned table
    that accreted more than ``max_files_per_partition`` part files —
    preserving the partition layout ``compact_table`` would erase.

    Each overfull ``col=value/`` dir is rewritten in place (read -> coalesce
    to ~``target_file_bytes`` files, optionally re-sorted so row-group
    min/max pruning survives the appends) and swapped via the journaled
    ``swap_partition_dir`` (any interrupted swap from a previous crashed
    run is finished first). Untouched partitions are never read: the
    maintenance cost tracks append churn, not table size — the right shape
    for incremental extracts that append a small delta per run.
    """
    repair_partition_swaps(path)
    compacted, skipped = 0, 0
    for d in sorted(os.listdir(path)) if os.path.isdir(path) else []:
        part_dir = os.path.join(path, d)
        if "=" not in d or not os.path.isdir(part_dir):
            continue
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        if len(files) <= max_files_per_partition:
            skipped += 1
            continue
        _n, total = table_file_stats(part_dir)
        n_out = max(1, math.ceil(total / target_file_bytes))
        df = spark.read.parquet(part_dir)
        if sort_by:
            df = df.coalesce(n_out).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(n_out)
        # staging/old dirs are '_'-prefixed SIBLINGS inside the table root:
        # Spark's file index ignores '_'- and '.'-prefixed paths, so a crash
        # between write and the renames can never leave a directory that
        # partition discovery parses as a partition value (a leftover
        # 'tb=3__compact_x' name would read as tb='3__compact_x' and either
        # duplicate rows or break partition-type inference)
        tmp = os.path.join(path, f"_compact_{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(tmp)
        swap_partition_dir(path, d, tmp)
        compacted += 1
    return {"compacted_partitions": compacted, "skipped_partitions": skipped}


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
    zorder_by: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` into ceil(total_bytes / target) files, atomically.

    Writes to a sibling temp dir, then swaps via rename — readers see either
    the old or the new table, never a partial one. (On an object store or a
    table format this becomes a metadata swap; the local-FS rename models the
    same contract.) Partition layout is intentionally NOT preserved: compact
    partitioned tables per-partition instead, or re-write with partitionBy.

    ``zorder_by``: cluster rows by a Morton key over these columns while
    compacting (``storage/clustering.py::zorder_key`` — the same key
    ``write_zordered`` uses at write time), so point/range predicates on
    ANY of them skip files and row groups via parquet min/max stats — the
    OPTIMIZE ZORDER BY maintenance action for tables that accreted
    unclustered appends. Gated by
    ``test_storage.py::test_zorder_compaction_improves_pruning``.

    Returns {files_before, files_after, bytes}.
    """
    before_n, total = table_file_stats(path)
    if before_n < min_files_to_compact and zorder_by is None:
        return {"files_before": before_n, "files_after": before_n, "bytes": total}
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    if zorder_by:
        from tickerlake_spark.storage.clustering import zorder_key

        z, _bounds = zorder_key(df, zorder_by)
        keyed = df.withColumn("__zorder", z)
        (
            keyed.repartitionByRange(n_files, "__zorder")
            .sortWithinPartitions("__zorder")
            .drop("__zorder")
            .write.mode("overwrite")
            .parquet(tmp)
        )
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after_n, _ = table_file_stats(path)
    return {"files_before": before_n, "files_after": after_n, "bytes": total}


def compact_ingest_partitions(
    spark: SparkSession,
    path: str,
    horizon_batch: int,
    batch_col: str = "ingest_batch",
) -> dict:
    """Collapse ``{batch_col} < horizon_batch`` partitions into a single
    ``{batch_col}=-1`` history partition per sibling partition directory.

    This is the compaction the incremental indexes
    (``streaming/vector_ingest.py``, ``streaming/search_index.py``,
    ``streaming/dedup_stream.py``) need: their exactly-once story relies on
    a replayed micro-batch overwriting its own ``ingest_batch=N``
    partition, so whole-table compaction (``compact_table``) — which
    erases the partition layout — would turn a replay into silent
    duplication. The safe horizon is the streaming checkpoint's committed
    offset: Structured Streaming never re-runs a batch whose commit file
    exists, so batches below it can be merged. -1 is never a real batch
    id, so later replays of live batches can never collide with compacted
    history, and re-compaction folds the existing ``-1`` partition in with
    newly-aged batches.

    Non-partition columns and every OTHER partition level (``cell=`` /
    ``term_bucket=``) are preserved, so planning-time pruning keeps
    working. The swap is per-bucket and CRASH-SAFE: before touching a
    bucket we drop a ``_compact_marker.json`` in it recording the staged
    history dir and the aged dirs to remove, then rename the new ``-1``
    in, delete that bucket's aged dirs, and remove the marker. A re-run
    after a crash first repairs any marked bucket (finish the rename if
    the staged dir still exists, then finish the deletes) — so aged rows
    can never be folded into a ``-1`` history that already contains them.
    Readers during a bucket's swap may briefly see duplicated history
    rows (the same non-atomicity any object-store rewrite has without a
    table format's metadata swap); run it from the maintenance path, not
    concurrently with a query SLA. Spark ignores ``_``-prefixed files, so
    a marker never breaks a concurrent scan.

    Returns {files_before, files_after, rows} (rows = compacted history
    rows; 0 when nothing is below the horizon).
    """
    from pyspark.sql import functions as F

    _repair_partial_compaction(path)
    files_before, _ = table_file_stats(path)
    df = spark.read.parquet(path)
    aged = df.filter((F.col(batch_col) < horizon_batch) & (F.col(batch_col) != -1))
    n_rows = aged.count()  # newly folded rows; the -1 history itself is not "work"
    if n_rows == 0:
        return {"files_before": files_before, "files_after": files_before, "rows": 0}
    # fold the existing history partition in with the newly aged batches
    old = df.filter((F.col(batch_col) < horizon_batch) | (F.col(batch_col) == -1))

    # discover the partition spec from the directory layout
    spec: list[str] = []
    probe = path
    while True:
        subdirs = [
            d
            for d in sorted(os.listdir(probe))
            if "=" in d and os.path.isdir(os.path.join(probe, d))
        ]
        if not subdirs:
            break
        col = subdirs[0].split("=")[0]
        spec.append(col)
        probe = os.path.join(probe, subdirs[0])
    if batch_col not in spec:
        raise ValueError(f"{batch_col} is not a partition level of {path}")

    tmp = f"{path.rstrip('/')}__hist_{uuid.uuid4().hex[:8]}"
    (
        old.withColumn(batch_col, F.lit(-1))
        .write.mode("overwrite")
        .partitionBy(*spec)
        .parquet(tmp)
    )

    # Per-bucket crash-safe swap. A "bucket" is the parent directory of the
    # batch_col= leaves (the table root itself when batch_col is the only
    # partition level). For each bucket with staged history: marker in,
    # -1 dir renamed in, aged dirs out, marker removed.
    leaf = f"{batch_col}=-1"
    for rel in _leaf_dirs(tmp, batch_col):
        bucket_rel = os.path.dirname(rel)  # "" at table root
        bucket = os.path.join(path, bucket_rel) if bucket_rel else path
        os.makedirs(bucket, exist_ok=True)
        aged = _aged_batch_dirs(bucket, batch_col, horizon_batch)
        _write_marker(bucket, {"staged": os.path.join(tmp, rel), "aged": aged})
        dst = os.path.join(bucket, leaf)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.rename(os.path.join(tmp, rel), dst)
        for d in aged:
            shutil.rmtree(os.path.join(bucket, d), ignore_errors=True)
        os.remove(os.path.join(bucket, _MARKER))
    shutil.rmtree(tmp, ignore_errors=True)

    files_after, _ = table_file_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": n_rows,
    }


_MARKER = "_compact_marker.json"


def _leaf_dirs(root: str, col: str) -> list[str]:
    out = []
    for r, dirs, _files in os.walk(root):
        for d in dirs:
            if d.startswith(f"{col}="):
                out.append(os.path.relpath(os.path.join(r, d), root))
    return sorted(out)


def _aged_batch_dirs(bucket: str, batch_col: str, horizon_batch: int) -> list[str]:
    """Names of this bucket's real-batch dirs below the horizon."""
    out = []
    for d in sorted(os.listdir(bucket)):
        if not d.startswith(f"{batch_col}="):
            continue
        val = d.split("=", 1)[1]
        try:
            if int(val) != -1 and int(val) < horizon_batch:
                out.append(d)
        except ValueError:
            continue
    return out


def _write_marker(bucket: str, payload: dict) -> None:
    import json

    tmp = os.path.join(bucket, _MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(bucket, _MARKER))


def _repair_partial_compaction(path: str) -> None:
    """Finish any bucket swap a crashed compaction left mid-flight.

    Marker semantics: {"staged": abs-path of the new -1 dir under the tmp
    root, "aged": [batch dir names to delete]}. If the staged dir still
    exists the crash hit before the rename — redo it; either way the aged
    dirs are then safe to delete (the -1 history in place already contains
    their rows). Idempotent; called before every compaction and usable
    standalone after a crash."""
    import json

    for r, dirs, files in os.walk(path):
        if _MARKER not in files:
            continue
        with open(os.path.join(r, _MARKER)) as f:
            m = json.load(f)
        staged = m["staged"]
        if os.path.isdir(staged):
            dst = os.path.join(r, os.path.basename(staged))
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.rename(staged, dst)
        for d in m["aged"]:
            shutil.rmtree(os.path.join(r, d), ignore_errors=True)
        os.remove(os.path.join(r, _MARKER))
