"""Version-based silver consumption from a bronze snapshot table
(VERDICT r10 item 6 / streaming/medallion.silver_consume_snapshot).

The parity contract: consuming bronze deltas BY CHECKPOINTED VERSION —
including across an upsert commit whose rewritten files re-deliver
unchanged rows (at-least-once) — must leave silver byte-identical to a
full recompute over the same final bronze content. The correction case is
exactly what the watermark path cannot do (it filters date > watermark,
so a corrected historical bar never reaches silver without a full
rewrite); the version path applies it incrementally.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tickerlake_spark import schemas
from tickerlake_spark.pipeline import run_silver
from tickerlake_spark.storage import Catalog, Checkpoints, read_table, write_table
from tickerlake_spark.storage.snapshots import snap_upsert, snap_write
from tickerlake_spark.streaming.medallion import silver_consume_snapshot

SILVER_TABLES = (
    "daily_aggregates",
    "weekly_aggregates",
    "monthly_aggregates",
    "daily_indicators",
    "weekly_indicators",
    "monthly_indicators",
)


def _bars(spark, rows):
    return schemas.conform(
        spark.createDataFrame(
            rows, "ticker string, date date, open double, high double, "
            "low double, close double, volume long, transactions long"
        ),
        schemas.STOCKS,
    )


def _mk_rows(tickers, days, vol=1_000):
    out = []
    for t in tickers:
        for i, d in enumerate(days):
            px = 10.0 + i + (hash(t) % 5)
            out.append((t, d, px, px + 1, px - 1, px + 0.5, vol + i, 10 + i))
    return out


def _collect(spark, cat, table):
    df = read_table(spark, cat.silver(table))
    rounded = df.select(
        *[
            F.round(c, 9).alias(c) if t == "double" else F.col(c)
            for c, t in sorted(df.dtypes)
        ]
    )
    return sorted(
        map(tuple, rounded.collect()),
        key=lambda row: tuple(
            (v is not None, v if v is not None else 0) for v in row
        ),
    )


def test_version_consumed_silver_matches_full_recompute(spark, tmp_path):
    days = [dt.date(2024, 1, 2) + dt.timedelta(days=i) for i in range(14)]
    tickers = ["AAA", "BBB"]
    batch1 = _mk_rows(tickers, days[:10])
    batch2 = _mk_rows(tickers, days[10:])
    # historical correction: AAA's day-3 volume triples (inside batch1's
    # already-consumed range — invisible to a watermark filter)
    corrected = [
        (t, d, o, h, lo, c, v * 3 if (t == "AAA" and d == days[3]) else v, n)
        for (t, d, o, h, lo, c, v, n) in batch1
        if t == "AAA" and d == days[3]
    ]

    # --- version path: bronze as a snapshot table, consumed by version
    cat_v = Catalog(root=str(tmp_path / "v"))
    cp_v = Checkpoints(str(tmp_path / "cp_v.json"))
    bronze = cat_v.bronze("stocks")
    snap_write(spark, _bars(spark, batch1), bronze, stats_cols=("date",))
    r1 = silver_consume_snapshot(spark, cat_v, cp_v)
    assert r1 == {"mode": "incremental", "from_version": 0, "version": 1}
    snap_write(
        spark, _bars(spark, batch2), bronze, mode="append", stats_cols=("date",)
    )
    r2 = silver_consume_snapshot(spark, cat_v, cp_v)
    assert r2["from_version"] == 1 and r2["version"] == 2
    # nothing new -> noop, no writes
    assert silver_consume_snapshot(spark, cat_v, cp_v)["mode"] == "noop"
    # the upsert commit rewrites batch1 files: the delta re-delivers
    # unchanged neighbors too (at-least-once) — convergence is the test
    up = snap_upsert(
        spark, bronze, _bars(spark, corrected), keys=["date", "ticker"],
        stats_cols=("date",),
    )
    assert up["rewrote_files"] >= 1
    r3 = silver_consume_snapshot(spark, cat_v, cp_v)
    assert r3["mode"] == "incremental" and r3["version"] == 3

    # --- ground truth: one FULL silver rewrite over the same final bronze
    final_rows = [
        r for r in batch1 if not (r[0] == "AAA" and r[1] == days[3])
    ] + corrected + batch2
    cat_f = Catalog(root=str(tmp_path / "f"))
    cp_f = Checkpoints(str(tmp_path / "cp_f.json"))
    write_table(
        _bars(spark, final_rows), cat_f.bronze("stocks"), partition_by="date"
    )
    assert run_silver(spark, cat_f, cp_f)["mode"] == "full"

    for table in SILVER_TABLES:
        assert _collect(spark, cat_v, table) == _collect(spark, cat_f, table), table

    # non-vacuous: the correction actually changed silver (volume ratio
    # windows see the tripled volume)
    vol = (
        read_table(spark, cat_v.silver("daily_aggregates"))
        .filter((F.col("ticker") == "AAA") & (F.col("date") == days[3]))
        .first()["volume"]
    )
    assert vol == (1_000 + 3) * 3
