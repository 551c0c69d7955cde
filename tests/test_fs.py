"""Filesystem-protocol crash-window matrix (VERDICT r9 item 1).

The journaled swap/repair machinery must converge from every crash state on
BOTH filesystem semantics:

- ``LocalFS`` (POSIX): atomic rename, directory fsync — the states the
  Spark-level tests in test_storage.py already drive (a: staged only,
  b: part renamed out, c: swap done old undead, d: delete intent).
- ``MemoryObjectStore``: NO rename (copy+delete, key by key), no fsync —
  the semantic model of S3/GCS. Here the crash windows are finer (between
  ANY two key operations), so beyond the named states the sweep injects a
  fault at EVERY op index and proves repair converges to the exact final
  layout each time — the commit story the 100 TB design brief needs
  (marker journal + atomic single-object PUT, no atomic rename anywhere).

These tests are pure-FS (no Spark): partitions are synthetic keys with
sentinel bytes, assertions are on the exact key layout — which is precisely
what a Spark reader would list.
"""

from __future__ import annotations

import json

import pytest

from tickerlake_spark.storage.fs import LocalFS, MemoryObjectStore
from tickerlake_spark.storage.maintenance import (
    repair_partition_swaps,
    swap_partition_dir,
)


def _make_fs(kind, tmp_path):
    if kind == "posix":
        return LocalFS(), str(tmp_path / "t")
    return MemoryObjectStore(), "/lake/t"


def _seed_table(fs, root):
    """Two partitions, one data file each."""
    fs.makedirs(root)
    fs.write_file_atomic(f"{root}/tb=0/part-old0.parquet", b"old0")
    fs.write_file_atomic(f"{root}/tb=1/part-old1.parquet", b"old1")


def _stage(fs, root, name="_compact_x", data=b"new0"):
    fs.write_file_atomic(f"{root}/{name}/part-new.parquet", data)


def _layout(fs, root):
    """Every file under root as rel-path -> bytes (what a reader sees)."""
    out = {}
    for r, _d, files in fs.walk(root):
        for f in files:
            full = f"{r.rstrip('/')}/{f}"
            out[full[len(root):].lstrip("/")] = fs.read_bytes(full)
    return out


SWAPPED = {
    "tb=0/part-new.parquet": b"new0",
    "tb=1/part-old1.parquet": b"old1",
}
ORIGINAL = {
    "tb=0/part-old0.parquet": b"old0",
    "tb=1/part-old1.parquet": b"old1",
}


@pytest.mark.parametrize("kind", ["posix", "objstore"])
def test_swap_completes_clean(kind, tmp_path):
    """No crash: swap replaces the partition exactly, no residue."""
    fs, root = _make_fs(kind, tmp_path)
    _seed_table(fs, root)
    _stage(fs, root)
    swap_partition_dir(root, "tb=0", f"{root}/_compact_x", fs=fs)
    assert _layout(fs, root) == SWAPPED


@pytest.mark.parametrize("kind", ["posix", "objstore"])
def test_state_a_marker_and_staged_only(kind, tmp_path):
    """State a: marker + fully-staged tmp, partition untouched. Repair
    must complete the swap FORWARD (tmp is complete by contract)."""
    fs, root = _make_fs(kind, tmp_path)
    _seed_table(fs, root)
    _stage(fs, root)
    fs.write_file_atomic(
        f"{root}/_swap_aa.json",
        json.dumps({"part": "tb=0", "tmp": "_compact_x", "old": "_old_aa"}).encode(),
    )
    assert repair_partition_swaps(root, fs=fs) == 1
    assert _layout(fs, root) == SWAPPED


def test_state_b_posix_part_renamed_out(tmp_path):
    """State b (POSIX): part renamed to _old_*, tmp still staged — the
    silent-loss window of the naive swap. Repair installs tmp, drops old."""
    fs, root = _make_fs("posix", tmp_path)
    _seed_table(fs, root)
    _stage(fs, root)
    fs.rename(f"{root}/tb=0", f"{root}/_old_bb")
    fs.write_file_atomic(
        f"{root}/_swap_bb.json",
        json.dumps({"part": "tb=0", "tmp": "_compact_x", "old": "_old_bb"}).encode(),
    )
    assert repair_partition_swaps(root, fs=fs) == 1
    assert _layout(fs, root) == SWAPPED


def test_state_b_objstore_partial_copy(tmp_path):
    """State b (object store): crash mid-copy — destination holds a mix of
    old and new keys, staged dir intact, marker state still 'intent'.
    Repair re-copies and deletes the stale extras."""
    fs, root = _make_fs("objstore", tmp_path)
    _seed_table(fs, root)
    _stage(fs, root)
    # hand-build the mid-copy state: one new key copied in, old key still
    # present (copy phase overwrites by key; names differ so both exist)
    fs.write_file_atomic(f"{root}/tb=0/part-new.parquet", b"new0")
    fs.write_file_atomic(
        f"{root}/_swap_cc.json",
        json.dumps(
            {"part": "tb=0", "tmp": "_compact_x", "old": "_old_cc",
             "state": "intent"}
        ).encode(),
    )
    assert repair_partition_swaps(root, fs=fs) == 1
    assert _layout(fs, root) == SWAPPED


@pytest.mark.parametrize("kind", ["posix", "objstore"])
def test_state_c_swap_done_residue_left(kind, tmp_path):
    """State c: destination complete, only cleanup pending (POSIX: _old_
    dir undead; object store: marker advanced to 'copied', staged remnant
    undead). Repair just cleans up — it must NOT touch the new data."""
    fs, root = _make_fs(kind, tmp_path)
    _seed_table(fs, root)
    fs.rmtree(f"{root}/tb=0")
    fs.write_file_atomic(f"{root}/tb=0/part-new.parquet", b"new0")
    if kind == "posix":
        fs.write_file_atomic(f"{root}/_old_dd/part-old0.parquet", b"old0")
        payload = {"part": "tb=0", "tmp": "_compact_gone", "old": "_old_dd"}
    else:
        fs.write_file_atomic(f"{root}/_compact_x/part-new.parquet", b"new0")
        payload = {"part": "tb=0", "tmp": "_compact_x", "old": "_old_dd",
                   "state": "copied"}
    fs.write_file_atomic(f"{root}/_swap_dd.json", json.dumps(payload).encode())
    assert repair_partition_swaps(root, fs=fs) == 1
    assert _layout(fs, root) == SWAPPED


@pytest.mark.parametrize("kind", ["posix", "objstore"])
def test_state_d_delete_intent(kind, tmp_path):
    """A journaled delete must finish as a delete on retry, never
    resurrect the partition."""
    fs, root = _make_fs(kind, tmp_path)
    _seed_table(fs, root)
    fs.write_file_atomic(
        f"{root}/_swap_ee.json",
        json.dumps(
            {"part": "tb=0", "tmp": "_gone", "old": "_old_ee", "delete": True}
        ).encode(),
    )
    assert repair_partition_swaps(root, fs=fs) == 1
    assert _layout(fs, root) == {"tb=1/part-old1.parquet": b"old1"}


class _FaultLocalFS:
    """LocalFS with a crash hook before every MUTATING call — the POSIX
    twin of MemoryObjectStore's per-key hook. Granularity is per-call
    (a POSIX rename IS atomic; rmtree is modeled as one op), so this
    sweeps the sequence-level crash windows of the journal protocol."""

    atomic_rename = True

    def __init__(self, base):
        self._b = base
        self._op_hook = None

    def __getattr__(self, name):
        return getattr(self._b, name)

    def _op(self):
        if self._op_hook is not None:
            self._op_hook()

    def rename(self, s, d):
        self._op()
        self._b.rename(s, d)

    def remove(self, p):
        self._op()
        self._b.remove(p)

    def rmtree(self, p):
        self._op()
        self._b.rmtree(p)

    def write_file_atomic(self, p, d):
        self._op()
        self._b.write_file_atomic(p, d)

    def copy_tree(self, s, d):
        self._op()
        self._b.copy_tree(s, d)


def _fresh_fault_fs(kind, tmp_path=None):
    if kind == "posix":
        import tempfile

        return _FaultLocalFS(LocalFS()), tempfile.mkdtemp(prefix="fsx_") + "/t"
    return MemoryObjectStore(), "/lake/t"


def _run_with_fault(nth: int, delete: bool = False, kind: str = "objstore"):
    """Drive a swap on a fresh filesystem, crashing at op ``nth``; then
    repair with faults off. Returns the repaired layout."""
    fs, root = _fresh_fault_fs(kind)
    _seed_table(fs, root)
    if not delete:
        _stage(fs, root)
        # two staged files exercises multi-key copy/delete phases
        fs.write_file_atomic(f"{root}/_compact_x/part-new2.parquet", b"new2")

    count = {"n": 0}

    def hook():
        count["n"] += 1
        if count["n"] > nth:
            raise RuntimeError("injected crash")

    fs._op_hook = hook
    crashed = False
    try:
        swap_partition_dir(
            root, "tb=0", f"{root}/_compact_x", delete=delete, fs=fs
        )
    except RuntimeError:
        crashed = True
    fs._op_hook = None
    repair_partition_swaps(root, fs=fs)
    return fs, root, crashed


def test_objstore_fault_sweep_replace():
    """Inject a crash between EVERY pair of key operations of the
    object-store swap; repair must converge to the exact swapped layout
    every time. This is the exhaustive crash-window matrix the rename-less
    commit story rests on."""
    want = {
        "tb=0/part-new.parquet": b"new0",
        "tb=0/part-new2.parquet": b"new2",
        "tb=1/part-old1.parquet": b"old1",
    }
    # first find the op count of a clean run, then sweep every prefix
    fs, root, crashed = _run_with_fault(10_000)
    assert not crashed
    fs2 = MemoryObjectStore()
    _seed_table(fs2, root)
    _stage(fs2, root)
    fs2.write_file_atomic(f"{root}/_compact_x/part-new2.parquet", b"new2")
    n_ops = {"n": 0}
    fs2._op_hook = lambda: n_ops.__setitem__("n", n_ops["n"] + 1)
    swap_partition_dir(root, "tb=0", f"{root}/_compact_x", fs=fs2)
    fs2._op_hook = None
    assert n_ops["n"] >= 6  # marker put, copies, extra-deletes, tmp deletes
    for k in range(n_ops["n"]):
        fs, root, crashed = _run_with_fault(k)
        assert crashed, k
        got = _layout(fs, root)
        if f"{root}/_swap_" not in str(got) and "tb=0/part-old0.parquet" in got:
            # crash BEFORE the marker landed: the journal contract is that
            # the swap never happened — the maintenance entry point retries
            # the whole operation (staged dir must still be intact)
            assert got["_compact_x/part-new.parquet"] == b"new0", k
            swap_partition_dir(root, "tb=0", f"{root}/_compact_x", fs=fs)
            got = _layout(fs, root)
        assert got == want, f"diverged after crash at op {k}"
        # no journal or staging residue after repair
        assert not [
            n for n in fs.listdir(root) if n.startswith(("_swap_", "_compact_"))
        ], k


def test_objstore_fault_sweep_delete():
    """Same exhaustive sweep for the delete-intent swap."""
    want = {"tb=1/part-old1.parquet": b"old1"}
    fs2 = MemoryObjectStore()
    _seed_table(fs2, "/lake/t")
    n_ops = {"n": 0}
    fs2._op_hook = lambda: n_ops.__setitem__("n", n_ops["n"] + 1)
    swap_partition_dir("/lake/t", "tb=0", "/lake/t/_gone", delete=True, fs=fs2)
    fs2._op_hook = None
    for k in range(n_ops["n"]):
        fs, root, crashed = _run_with_fault(k, delete=True)
        assert crashed, k
        got = _layout(fs, root)
        if "tb=0/part-old0.parquet" in got:
            # crash before the marker landed: swap never happened — retry
            swap_partition_dir(root, "tb=0", f"{root}/_gone", delete=True, fs=fs)
            got = _layout(fs, root)
        assert got == want, f"diverged after crash at op {k}"


def test_posix_fault_sweep_replace():
    """The same exhaustive crash sweep on the POSIX branch: a fault
    before every mutating call of the rename-based journal sequence
    (marker put, rename-out, rename-in, cleanups) must repair to the
    exact swapped layout."""
    want = {
        "tb=0/part-new.parquet": b"new0",
        "tb=0/part-new2.parquet": b"new2",
        "tb=1/part-old1.parquet": b"old1",
    }
    fs2, root2 = _fresh_fault_fs("posix")
    _seed_table(fs2, root2)
    _stage(fs2, root2)
    fs2.write_file_atomic(f"{root2}/_compact_x/part-new2.parquet", b"new2")
    n_ops = {"n": 0}
    fs2._op_hook = lambda: n_ops.__setitem__("n", n_ops["n"] + 1)
    swap_partition_dir(root2, "tb=0", f"{root2}/_compact_x", fs=fs2)
    fs2._op_hook = None
    assert _layout(fs2, root2) == want
    assert n_ops["n"] >= 4
    for k in range(n_ops["n"]):
        fs, root, crashed = _run_with_fault(k, kind="posix")
        assert crashed, k
        got = _layout(fs, root)
        if not [
            n for n in fs.listdir(root) if n.startswith("_swap_")
        ] and "tb=0/part-old0.parquet" in got:
            # crash before the marker landed: swap never happened — retry
            swap_partition_dir(root, "tb=0", f"{root}/_compact_x", fs=fs)
            got = _layout(fs, root)
        assert got == want, f"posix diverged after crash at op {k}"
        assert not [
            n for n in fs.listdir(root) if n.startswith(("_swap_", "_compact_"))
        ], k


def test_objstore_interrupted_repair_retry():
    """A repair that itself crashes mid-flight must converge on retry —
    the interrupted-repair scenario from the POSIX matrix, replayed on
    rename-less semantics at every repair op index."""
    # build the state-a crash (marker + staged, nothing mutated), then
    # crash the REPAIR at every op index and re-repair
    fs2 = MemoryObjectStore()
    root = "/lake/t"
    _seed_table(fs2, root)
    _stage(fs2, root)
    fs2.write_file_atomic(
        f"{root}/_swap_rr.json",
        json.dumps({"part": "tb=0", "tmp": "_compact_x", "old": "_old_rr"}).encode(),
    )
    n_ops = {"n": 0}
    fs2._op_hook = lambda: n_ops.__setitem__("n", n_ops["n"] + 1)
    repair_partition_swaps(root, fs=fs2)
    fs2._op_hook = None
    assert _layout(fs2, root) == SWAPPED

    for k in range(n_ops["n"]):
        fs = MemoryObjectStore()
        _seed_table(fs, root)
        _stage(fs, root)
        fs.write_file_atomic(
            f"{root}/_swap_rr.json",
            json.dumps(
                {"part": "tb=0", "tmp": "_compact_x", "old": "_old_rr"}
            ).encode(),
        )
        count = {"n": 0}

        def hook():
            count["n"] += 1
            if count["n"] > k:
                raise RuntimeError("injected crash")

        fs._op_hook = hook
        try:
            repair_partition_swaps(root, fs=fs)
        except RuntimeError:
            pass
        fs._op_hook = None
        repair_partition_swaps(root, fs=fs)
        assert _layout(fs, root) == SWAPPED, f"repair retry diverged at op {k}"


def test_bucket_swap_repair_both_semantics(tmp_path):
    """compact_ingest_partitions' per-bucket marker repair converges on
    both filesystems: staged -1 history installed exactly once, aged batch
    dirs gone, no marker left."""
    from tickerlake_spark.storage.maintenance import (
        _MARKER,
        _repair_partial_compaction,
    )

    for kind in ("posix", "objstore"):
        fs, root = _make_fs(kind, tmp_path)
        # bucket with aged batches 0,1, live batch 7, staged -1 history
        fs.write_file_atomic(f"{root}/b=0/ingest_batch=0/f0.parquet", b"a0")
        fs.write_file_atomic(f"{root}/b=0/ingest_batch=1/f1.parquet", b"a1")
        fs.write_file_atomic(f"{root}/b=0/ingest_batch=7/f7.parquet", b"live")
        staged_root = f"{root}__hist"
        fs.write_file_atomic(f"{staged_root}/b=0/ingest_batch=-1/h.parquet", b"hist")
        payload = {
            "staged": f"{staged_root}/b=0/ingest_batch=-1",
            "aged": ["ingest_batch=0", "ingest_batch=1"],
        }
        fs.write_file_atomic(
            f"{root}/b=0/{_MARKER}", json.dumps(payload).encode()
        )
        _repair_partial_compaction(root, fs=fs)
        assert _layout(fs, root) == {
            "b=0/ingest_batch=-1/h.parquet": b"hist",
            "b=0/ingest_batch=7/f7.parquet": b"live",
        }, kind
        assert not fs.exists(f"{root}/b=0/{_MARKER}"), kind


def test_footer_probes_through_objstore(spark, tmp_path):
    """The footer-stats probes (watermark max, null-count proof) and the
    layout probes (exists, partition column, partition-listing watermark)
    work over an object store: real parquet bytes served from memory via
    ``open_read``, listings from key prefixes — no POSIX call anywhere."""
    import datetime as dt

    from tickerlake_spark.storage import (
        detect_partition_column,
        get_max_date,
        parquet_stats_all_non_null,
        parquet_stats_max,
        table_exists,
    )

    # write real parquet locally, then load the BYTES into the store
    local = str(tmp_path / "src")
    spark.createDataFrame(
        [("A", dt.date(2024, 1, 2), 1.5), ("B", dt.date(2024, 1, 3), 2.5)],
        "ticker string, last_date date, v double",
    ).coalesce(1).write.parquet(local)
    import os

    pq_bytes = None
    for f in os.listdir(local):
        if f.endswith(".parquet"):
            with open(os.path.join(local, f), "rb") as fh:
                pq_bytes = fh.read()
    assert pq_bytes

    fs = MemoryObjectStore()
    t = "/lake/state"
    fs.write_file_atomic(f"{t}/part-0.parquet", pq_bytes)
    # staging residue that every probe must skip
    fs.write_file_atomic(f"{t}/_compact_zz/part-9.parquet", pq_bytes)

    assert table_exists(t, fs=fs)
    assert not table_exists("/lake/absent", fs=fs)
    assert parquet_stats_max(t, "last_date", fs=fs) == dt.date(2024, 1, 3)
    assert parquet_stats_all_non_null(t, ["ticker", "v"], fs=fs) is True

    # hive-partitioned layout probes from prefixes alone
    p = "/lake/daily"
    fs.write_file_atomic(f"{p}/date=2024-01-02/f.parquet", pq_bytes)
    fs.write_file_atomic(f"{p}/date=2024-01-05/f.parquet", pq_bytes)
    fs.write_file_atomic(f"{p}/_swap_x.json", b"{}")
    assert detect_partition_column(p, fs=fs) == "date"
    # partition-listing watermark never needs Spark: spark=None proves it
    assert get_max_date(None, p, fs=fs) == "2024-01-05"


# ---------------------------------------------------------------------------
# HadoopFS: the PRODUCTION adapter (s3a/gs/hdfs/abfs in deployment) driven
# here over file:// through the same protocol surface. Both journal
# branches run against it: atomic_rename=True (HDFS-style rename sequence)
# and atomic_rename=False (object-store marker-state copy+delete — the
# exact code path an s3a deployment takes, exercised on a real Hadoop
# FileSystem rather than only the in-memory model).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("atomic", [True, False])
def test_hadoopfs_swap_and_repair(spark, tmp_path, atomic):
    from tickerlake_spark.storage.fs import HadoopFS

    fs = HadoopFS(spark, atomic_rename=atomic)
    root = str(tmp_path / f"t_{int(atomic)}")
    _seed_table(fs, root)
    _stage(fs, root)
    swap_partition_dir(root, "tb=0", f"{root}/_compact_x", fs=fs)
    assert _layout(fs, root) == SWAPPED

    # state a crash (marker + staged, nothing mutated) repairs forward
    _stage(fs, root, name="_compact_y", data=b"new1")
    fs.write_file_atomic(
        f"{root}/_swap_hh.json",
        json.dumps({"part": "tb=1", "tmp": "_compact_y", "old": "_old_hh"}).encode(),
    )
    assert repair_partition_swaps(root, fs=fs) == 1
    assert _layout(fs, root) == {
        "tb=0/part-new.parquet": b"new0",
        "tb=1/part-new.parquet": b"new1",
    }

    # delete intent
    fs.write_file_atomic(
        f"{root}/_swap_ii.json",
        json.dumps(
            {"part": "tb=0", "tmp": "_gone", "old": "_old_ii", "delete": True}
        ).encode(),
    )
    assert repair_partition_swaps(root, fs=fs) == 1
    assert _layout(fs, root) == {"tb=1/part-new.parquet": b"new1"}


def test_hadoopfs_probes_and_walk_pruning(spark, tmp_path):
    """Footer probes + staging-dir pruning through the Hadoop adapter."""
    import datetime as dt

    from tickerlake_spark.storage import (
        detect_partition_column,
        get_max_date,
        parquet_stats_max,
        table_exists,
    )
    from tickerlake_spark.storage.fs import HadoopFS

    fs = HadoopFS(spark)
    t = str(tmp_path / "state")
    spark.createDataFrame(
        [("A", dt.date(2024, 1, 2)), ("B", dt.date(2024, 1, 5))],
        "ticker string, last_date date",
    ).coalesce(1).write.parquet(t)
    assert table_exists(t, fs=fs)
    assert parquet_stats_max(t, "last_date", fs=fs) == dt.date(2024, 1, 5)

    # staging residue is pruned by the shared walk rules
    fs.write_file_atomic(
        f"{t}/_compact_zz/part-9.parquet", fs.read_bytes(
            f"{t}/" + [f for f in fs.listdir(t) if f.endswith(".parquet")][0]
        )
    )
    assert parquet_stats_max(t, "last_date", fs=fs) == dt.date(2024, 1, 5)

    p = str(tmp_path / "daily")
    for d in ("2024-01-02", "2024-01-05"):
        fs.write_file_atomic(f"{p}/date={d}/f.parquet", b"x")
    assert detect_partition_column(p, fs=fs) == "date"
    assert get_max_date(None, p, fs=fs) == "2024-01-05"


# ---------------------------------------------------------------------------
# r10: the remaining driver-side mutation call sites migrated onto the FS
# protocol — the pending-delete journal (upsert.py), pipeline checkpoints,
# the indicator tail swap, and the edge-table layout marker — each driven
# through object-store semantics.
# ---------------------------------------------------------------------------


def _seed_pending(state: str):
    fs = MemoryObjectStore()
    root = "/lake/t"
    _seed_table(fs, root)
    fs.write_file_atomic(
        f"{root}/_pending_deletes.json",
        json.dumps({"parts": ["tb=0"], "state": state}).encode(),
    )
    return fs, root


def test_pending_deletes_objstore_committed_applies():
    from tickerlake_spark.storage.upsert import repair_pending_deletes

    fs, root = _seed_pending("committed")
    repair_pending_deletes(root, fs=fs)
    assert _layout(fs, root) == {"tb=1/part-old1.parquet": b"old1"}
    assert not [n for n in fs.listdir(root) if n.startswith("_")]


def test_pending_deletes_objstore_intent_dropped():
    """Intent-state marker: the overwrite never provably committed, so the
    partitions must SURVIVE (deleting would lose rows the overwrite was
    about to migrate) and only the stale marker goes."""
    from tickerlake_spark.storage.upsert import repair_pending_deletes

    fs, root = _seed_pending("intent")
    repair_pending_deletes(root, fs=fs)
    assert _layout(fs, root) == ORIGINAL
    assert not fs.isfile(f"{root}/_pending_deletes.json")


def test_pending_deletes_objstore_fault_sweep():
    """Crash between EVERY pair of key ops of the committed-delete apply;
    the standard repair entry sequence (swap repair, then pending-delete
    repair) must converge to the deleted layout every time."""
    from tickerlake_spark.storage.upsert import repair_pending_deletes

    # op count of a clean run
    fs, root = _seed_pending("committed")
    n_ops = {"n": 0}
    fs._op_hook = lambda: n_ops.__setitem__("n", n_ops["n"] + 1)
    repair_pending_deletes(root, fs=fs)
    fs._op_hook = None
    assert n_ops["n"] >= 3

    want = {"tb=1/part-old1.parquet": b"old1"}
    for k in range(n_ops["n"]):
        fs, root = _seed_pending("committed")
        left = {"n": k}

        def _boom():
            if left["n"] == 0:
                raise RuntimeError("crash")
            left["n"] -= 1

        fs._op_hook = _boom
        with pytest.raises(RuntimeError):
            repair_pending_deletes(root, fs=fs)
        fs._op_hook = None
        repair_partition_swaps(root, fs=fs)
        repair_pending_deletes(root, fs=fs)
        assert _layout(fs, root) == want, f"diverged after crash at op {k}"
        assert not [n for n in fs.listdir(root) if n.startswith("_")], k


def test_checkpoints_objstore_roundtrip():
    from tickerlake_spark.storage.checkpoints import Checkpoints

    fs = MemoryObjectStore()
    cp = Checkpoints("/lake/_checkpoints.json", fs=fs)
    assert cp.load() == {}
    cp.set("bronze_stocks_last_date", "2024-01-05")
    cp.set("last_run_timestamp", "t1")
    assert cp.get("bronze_stocks_last_date") == "2024-01-05"
    assert Checkpoints("/lake/_checkpoints.json", fs=fs).load() == {
        "bronze_stocks_last_date": "2024-01-05",
        "last_run_timestamp": "t1",
    }
    # a crashed save is all-or-nothing: the PUT either landed or the old
    # document is intact — never a torn file
    fs._op_hook = lambda: (_ for _ in ()).throw(RuntimeError("crash"))
    with pytest.raises(RuntimeError):
        cp.set("last_run_timestamp", "t2")
    fs._op_hook = None
    assert cp.get("last_run_timestamp") == "t1"


def test_upsert_objstore_semantics(spark, tmp_path):
    """The full keyed-merge surface through the production adapter in its
    rename-less mode (the exact branch an s3a deployment takes): create,
    dynamic-partition merge, and a replace_keys that EMPTIES a partition
    (pending-delete journal through the FS). No POSIX residue."""
    import os

    from tickerlake_spark.storage.fs import HadoopFS
    from tickerlake_spark.storage.upsert import replace_keys, upsert_table

    fs = HadoopFS(spark, atomic_rename=False)
    path = str(tmp_path / "obj_t")
    df = spark.createDataFrame(
        [("A", 1, 10.0), ("B", 1, 20.0), ("C", 2, 30.0)],
        "k string, d int, v double",
    )
    r = upsert_table(spark, path, df, keys=["k", "d"], partition_by="d", fs=fs)
    assert r["mode"] == "create"

    up = spark.createDataFrame([("B", 1, 21.0), ("D", 2, 40.0)],
                               "k string, d int, v double")
    r = upsert_table(spark, path, up, keys=["k", "d"], partition_by="d", fs=fs)
    assert r["mode"] == "dynamic-partition"
    got = {(x.k, x.d, x.v) for x in spark.read.parquet(path).collect()}
    assert got == {("A", 1, 10.0), ("B", 1, 21.0), ("C", 2, 30.0),
                   ("D", 2, 40.0)}

    # replace away every key of partition d=2: its dir must be deleted via
    # the journaled pending-delete path, not left stale
    kv = spark.createDataFrame([("C", 2), ("D", 2)], "k string, d int")
    empty = spark.createDataFrame([], "k string, d int, v double")
    replace_keys(spark, path, kv, empty, keys=["k", "d"],
                 partition_by="d", fs=fs)
    got = {(x.k, x.d, x.v) for x in spark.read.parquet(path).collect()}
    assert got == {("A", 1, 10.0), ("B", 1, 21.0)}
    residue = [n for n in os.listdir(path)
               if n.startswith(("_swap_", "_pending", "_old_"))]
    assert residue == []
    assert not [n for n in os.listdir(os.path.dirname(path))
                if "__" in n or n.startswith("_swap_")]


def test_replace_tail_objstore(spark, tmp_path):
    """Tail swap on rename-less semantics: delegates to the journaled
    replace_table (a partial two-rename copy would read as a silently
    TRUNCATED context table), finishes an interrupted predecessor's
    marker, and sweeps its orphans."""
    import os

    from pyspark.sql import functions as F

    from tickerlake_spark.operators.indicator_state import replace_tail
    from tickerlake_spark.storage.fs import HadoopFS

    fs = HadoopFS(spark, atomic_rename=False)
    lake = tmp_path / "lake"
    lake.mkdir()
    path = str(lake / "tail_daily")

    v1 = spark.createDataFrame([("A", 1)], "ticker string, v int")
    replace_tail(spark, v1, path, fs=fs)
    assert [r.v for r in spark.read.parquet(path).collect()] == [1]

    # self-lineage overwrite (the real call shape: new tail reads old)
    v2 = spark.read.parquet(path).withColumn("v", F.lit(2))
    replace_tail(spark, v2, path, fs=fs)
    assert [r.v for r in spark.read.parquet(path).collect()] == [2]

    # interrupted predecessor: a journaled marker referencing a staged
    # __tail_ dir (state intent). The next replace_tail must FINISH it
    # before sweeping — then install its own data on top.
    stale = spark.createDataFrame([("A", 99)], "ticker string, v int")
    staged = f"{path}__tail_deadbeef"
    stale.write.parquet(staged)
    marker = str(lake / "_swap_dead.json")
    with open(marker, "w") as f:
        json.dump({"part": "tail_daily", "tmp": "tail_daily__tail_deadbeef",
                   "old": "_old_dead", "delete": False}, f)
    v3 = spark.createDataFrame([("A", 3)], "ticker string, v int")
    replace_tail(spark, v3, path, fs=fs)
    assert [r.v for r in spark.read.parquet(path).collect()] == [3]
    names = os.listdir(lake)
    assert not [n for n in names if n.startswith("_swap_") or "__" in n], names


def test_upsert_edges_objstore(spark, tmp_path):
    """Edge-table maintenance (canonicalized upsert + layout marker)
    through the rename-less adapter."""
    from tickerlake_spark.operators.graph import read_edges, upsert_edges
    from tickerlake_spark.storage.fs import HadoopFS

    fs = HadoopFS(spark, atomic_rename=False)
    path = str(tmp_path / "edges")
    pairs = spark.createDataFrame([("u1", "p1"), ("p1", "u1"), ("u2", "p1")],
                                  "a string, b string")
    upsert_edges(spark, path, pairs, fs=fs)
    got = {(r.src, r.dst) for r in read_edges(spark, path,
                                              symmetrize=False).collect()}
    assert got == {("p1", "u1"), ("p1", "u2")}
    assert fs.isfile(f"{path}/_edge_layout.json")
    # idempotent replay through the same fs
    upsert_edges(spark, path, pairs, fs=fs)
    assert read_edges(spark, path, symmetrize=False).count() == 2


def test_repair_table_swaps_is_scoped():
    """A merge entry's repair must finish only ITS table's markers: a
    parent-wide repair would replay a sibling table's live marker
    concurrently with the sibling's own swap (renaming the just-installed
    table away). Here the sibling's marker must survive untouched."""
    from tickerlake_spark.storage.maintenance import repair_table_swaps

    fs = MemoryObjectStore()
    layer = "/lake/gold"
    # table A: interrupted swap (marker + staged)
    fs.write_file_atomic(f"{layer}/ta/part-0.parquet", b"a-old")
    fs.write_file_atomic(f"{layer}/ta__new/part-1.parquet", b"a-new")
    fs.write_file_atomic(
        f"{layer}/_swap_aa.json",
        json.dumps({"part": "ta", "tmp": "ta__new", "old": "_old_aa"}).encode(),
    )
    # table B: a LIVE sibling marker mid-swap
    fs.write_file_atomic(f"{layer}/tb/part-0.parquet", b"b-old")
    fs.write_file_atomic(f"{layer}/tb__new/part-1.parquet", b"b-new")
    fs.write_file_atomic(
        f"{layer}/_swap_bb.json",
        json.dumps({"part": "tb", "tmp": "tb__new", "old": "_old_bb"}).encode(),
    )
    assert repair_table_swaps(layer, "ta", fs=fs) == 1
    assert _layout(fs, f"{layer}/ta") == {"part-1.parquet": b"a-new"}
    # sibling untouched: marker still present, table still old
    assert fs.isfile(f"{layer}/_swap_bb.json")
    assert _layout(fs, f"{layer}/tb") == {"part-0.parquet": b"b-old"}


def test_replace_table_single_component_relative_path(tmp_path, monkeypatch):
    """A relative one-component table path swaps against '.' as its layer
    dir (the pre-journal two-rename handled these; rsplit alone raised)."""
    from tickerlake_spark.storage.fs import LocalFS
    from tickerlake_spark.storage.maintenance import replace_table

    monkeypatch.chdir(tmp_path)
    fs = LocalFS()
    fs.write_file_atomic("reltable/part-0.parquet", b"old")
    fs.write_file_atomic("reltable__new/part-0.parquet", b"new")
    replace_table("reltable", "reltable__new", fs=fs)
    assert fs.read_bytes("reltable/part-0.parquet") == b"new"
    assert not fs.isdir("reltable__new")
    assert not [n for n in fs.listdir(".") if n.startswith("_swap_")]


def test_hadoopfs_write_file_atomic_overwrites_atomically(spark, tmp_path):
    """Updating an EXISTING file goes through FileContext's
    rename-with-OVERWRITE — one metadata op, no delete-then-rename window
    where the file is absent (a vanished checkpoint reads as 'no
    watermark' and silently re-ingests history)."""
    from tickerlake_spark.storage.fs import HadoopFS

    fs = HadoopFS(spark, atomic_rename=True)
    p = str(tmp_path / "cp.json")
    fs.write_file_atomic(p, b"v1")
    fs.write_file_atomic(p, b"v2")
    fs.write_file_atomic(p, b"v3")
    assert fs.read_bytes(p) == b"v3"
    import os

    assert not [n for n in os.listdir(tmp_path) if n.endswith(".tmp")]


def test_upsert_retry_after_committed_pending_delete_crash(spark, tmp_path):
    """Crash-recovery ordering: a committed pending-delete marker left by
    a crashed merge is applied BEFORE the retry's read builds its file
    index — the retried merge that touches the same partition must
    succeed, not die scanning files the repair just deleted."""
    import json as _json
    import os

    from tickerlake_spark.storage.upsert import upsert_table

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("A", 1, 1.0), ("B", 2, 2.0)], "k string, d int, v double"
    )
    upsert_table(spark, path, df, keys=["k"], partition_by="d")
    # simulate the crash state: overwrite committed, d=2's delete pending
    with open(os.path.join(path, "_pending_deletes.json"), "w") as f:
        _json.dump({"parts": ["d=2"], "state": "committed"}, f)
    up = spark.createDataFrame([("C", 2, 3.0)], "k string, d int, v double")
    r = upsert_table(spark, path, up, keys=["k"], partition_by="d")
    assert r["mode"] == "dynamic-partition"
    got = {(x.k, x.d, x.v) for x in spark.read.parquet(path).collect()}
    # B's rows died with the journaled delete; the retry's C landed
    assert got == {("A", 1, 1.0), ("C", 2, 3.0)}
    assert not os.path.exists(os.path.join(path, "_pending_deletes.json"))


def test_repair_table_swaps_tolerates_vanishing_sibling_marker():
    """TOCTOU with a live sibling: its marker disappears between our
    listdir and read (the sibling finished its own swap). The scoped
    repair must skip it, not crash this table's mutation."""
    from tickerlake_spark.storage.maintenance import repair_table_swaps

    class VanishingFS(MemoryObjectStore):
        def read_bytes(self, path):
            if path.endswith("_swap_bb.json"):
                self.objects.pop(path, None)  # sibling finished its swap
                raise KeyError(path)  # object-store missing-key shape
            return super().read_bytes(path)

    fs = VanishingFS()
    layer = "/lake/gold"
    fs.write_file_atomic(f"{layer}/ta/part-0.parquet", b"a-old")
    fs.write_file_atomic(f"{layer}/ta__new/part-1.parquet", b"a-new")
    fs.write_file_atomic(
        f"{layer}/_swap_aa.json",
        json.dumps({"part": "ta", "tmp": "ta__new", "old": "_old_aa"}).encode(),
    )
    fs.write_file_atomic(f"{layer}/_swap_bb.json", b'{"part": "tb"}')
    assert repair_table_swaps(layer, "ta", fs=fs) == 1
    assert _layout(fs, f"{layer}/ta") == {"part-1.parquet": b"a-new"}


def test_split_layer_edges():
    from tickerlake_spark.storage.maintenance import split_layer

    assert split_layer("/a/b/") == ("/a", "b")
    assert split_layer("/t") == ("/", "t")  # root-level, NOT cwd
    assert split_layer("t") == (".", "t")


def test_upsert_repairs_before_layout_probe(spark, tmp_path):
    """A crashed swap hiding the table's ONLY partition under _old_* must
    be repaired BEFORE layout detection: otherwise the caller's
    partition_by=None reads an 'unpartitioned' table and the merge
    silently flattens the Hive layout."""
    import os
    import shutil

    from tickerlake_spark.storage.io import detect_partition_column
    from tickerlake_spark.storage.upsert import upsert_table

    path = str(tmp_path / "t")
    df = spark.createDataFrame([("A", 1, 1.0)], "k string, d int, v double")
    upsert_table(spark, path, df, keys=["k"], partition_by="d")
    assert detect_partition_column(path) == "d"
    # crash state b: the only partition renamed out, staged dir + marker
    shutil.copytree(os.path.join(path, "d=1"), os.path.join(path, "_compact_x"))
    os.rename(os.path.join(path, "d=1"), os.path.join(path, "_old_x"))
    with open(os.path.join(path, "_swap_x.json"), "w") as f:
        json.dump({"part": "d=1", "tmp": "_compact_x", "old": "_old_x"}, f)
    # caller doesn't know the layout (partition_by=None)
    up = spark.createDataFrame([("B", 1, 2.0)], "k string, d int, v double")
    r = upsert_table(spark, path, up, keys=["k"])
    assert detect_partition_column(path) == "d", "layout was flattened"
    assert r["mode"] == "dynamic-partition"
    got = {(x.k, x.v) for x in spark.read.parquet(path).collect()}
    assert got == {("A", 1.0), ("B", 2.0)}


def test_hadoopfs_put_if_absent_crash_leaves_no_torn_manifest(spark, tmp_path):
    """ADVICE r10 high: create(overwrite=False) made the manifest path
    VISIBLE (and version-listed) before its bytes landed — a crash between
    create and close left a permanently torn 'current' manifest. The fix
    writes a sibling tmp claim fully, then CASes it in with one atomic
    rename: a crash at any point leaves the destination absent."""
    from tickerlake_spark.storage.fs import HadoopFS
    from tickerlake_spark.storage.snapshots import snap_current_version

    class CrashyFS(HadoopFS):
        def __init__(self, spark):
            super().__init__(spark, atomic_rename=True)
            self.crashed = False

        def _create_write(self, path, data, overwrite):
            if not self.crashed:
                self.crashed = True
                super()._create_write(path, data[: len(data) // 2], overwrite)
                raise RuntimeError("injected crash mid-write")
            super()._create_write(path, data, overwrite)

    fs = CrashyFS(spark)
    table = str(tmp_path / "t")
    p = f"{table}/_snap/v0000000001.json"
    with pytest.raises(RuntimeError, match="injected crash"):
        fs.put_if_absent(p, b'{"version": 1, "files": []}')
    # the destination NEVER appeared: no reader can load a torn manifest,
    # and the version listing still says "no table"
    assert not fs.exists(p)
    assert snap_current_version(table, fs=fs) == 0
    # retry wins cleanly with complete content; CAS then refuses a second
    assert fs.put_if_absent(p, b'{"version": 1, "files": []}')
    assert fs.read_bytes(p) == b'{"version": 1, "files": []}'
    assert not fs.put_if_absent(p, b"other")
    assert fs.read_bytes(p) == b'{"version": 1, "files": []}'
    # no .claim residue is ever surfaced as a version, win or lose
    assert snap_current_version(table, fs=fs) == 1


def test_hadoopfs_put_if_absent_loser_cleans_claim(spark, tmp_path):
    from tickerlake_spark.storage.fs import HadoopFS

    fs = HadoopFS(spark, atomic_rename=True)
    p = str(tmp_path / "m.json")
    assert fs.put_if_absent(p, b"winner")
    assert not fs.put_if_absent(p, b"loser")
    assert fs.read_bytes(p) == b"winner"
    # the loser's tmp claim is removed, not leaked next to the manifest
    leftovers = [n for n in fs.listdir(str(tmp_path)) if ".claim." in n]
    assert leftovers == []
