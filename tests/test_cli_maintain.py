"""The maintain CLI verbs over snapshot tables (__main__.py, r11):
RESTORE routing, OPTIMIZE ZORDER routing, and the snapshot/non-snapshot
dispatch. main() is driven in-process with a stop-proof session proxy —
the CLI's spark.stop() must not tear down the suite's shared session."""

from __future__ import annotations

import datetime as dt
import json

from tickerlake_spark.storage.snapshots import (
    snap_current_version,
    snap_read,
    snap_write,
)


class _NoStop:
    def __init__(self, s):
        self._s = s

    def __getattr__(self, n):
        return getattr(self._s, n)

    def stop(self):
        pass


def _main(spark, monkeypatch, argv):
    import tickerlake_spark.session as session_mod
    from tickerlake_spark.__main__ import main

    monkeypatch.setattr(
        session_mod, "get_spark", lambda **kw: _NoStop(spark)
    )
    return main(argv)


def _last_json(capsys):
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    return json.loads(out[-1])


def test_maintain_restore_version(spark, tmp_path, monkeypatch, capsys):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("A", dt.date(2024, 1, 1), 1.0)], "k string, d date, v double"
    )
    bad = spark.createDataFrame(
        [("Z", dt.date(2024, 9, 9), -1.0)], "k string, d date, v double"
    )
    snap_write(spark, df, path)
    snap_write(spark, bad, path, mode="append")
    rc = _main(spark, monkeypatch, [
        "maintain", "--table", path, "--restore-version", "1",
        "--data-root", str(tmp_path),
    ])
    assert rc == 0
    out = _last_json(capsys)
    assert out["op"] == "restore" and out["version"] == 3
    assert snap_current_version(path) == 3
    assert {r.k for r in snap_read(spark, path).collect()} == {"A"}


def test_maintain_restore_refuses_plain_table(spark, tmp_path, monkeypatch, capsys):
    path = str(tmp_path / "plain")
    spark.range(5).write.parquet(path)
    rc = _main(spark, monkeypatch, [
        "maintain", "--table", path, "--restore-version", "1",
        "--data-root", str(tmp_path),
    ])
    assert rc == 2  # only manifest commits are restorable


def test_maintain_zorder_routes_to_snapshot_compact(spark, tmp_path, monkeypatch, capsys):
    path = str(tmp_path / "g")
    n = 32
    g = spark.createDataFrame(
        [(x, y, float(x)) for x in range(n) for y in range(n)],
        "x int, y int, v double",
    )
    snap_write(spark, g, path, cluster_by=("x",), target_files=8)
    total = len(snap_read(spark, path).inputFiles())
    assert len(snap_read(spark, path, prune=("y", 0, 7)).inputFiles()) == total
    rc = _main(spark, monkeypatch, [
        "maintain", "--table", path, "--zorder", "x, y",  # stray space OK
        "--target-file-mb", "1", "--data-root", str(tmp_path),
    ])
    assert rc == 0
    out = _last_json(capsys)
    assert out["compacted_files"] == total  # OPTIMIZE ZORDER rewrote all
    # sanity: table still holds every row (vacuum ran after the commit)
    assert snap_read(spark, path).count() == n * n
