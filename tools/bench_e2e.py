#!/usr/bin/env python
"""Reference-scale end-to-end benchmark: bronze -> silver -> gold at ~12.5M bars.

BASELINE.md's only published figures are operational runtimes at this exact
scale — ~10k tickers x 5 years of daily bars (~12.5M rows) on a 2-vCPU
GitHub Actions runner: silver full rewrite 15-30 min, gold (VWAP) 2-5 min
(reference: src/tickerlake/silver/main.py:241, src/tickerlake/gold/models.py:54).
This script reproduces that workload shape 1:1 — same table schemas, same
split cadence (~500 splits), CS/ETF ticker metadata — and times the REAL
pipeline entry points (`run_silver`, `run_gold`) against it, so the
BASELINE.md comparison needs no linear-scaling extrapolation.

The bronze layer is generated distributed (spark.range cross-join over the
trading calendar; all columns are deterministic hash functions of
(ticker, date) — no driver-side data, no RNG state). Generation + the
date-partitioned bronze write are timed separately: the baseline's bronze
number is API-download-bound, which no engine comparison can reproduce
offline.

Usage:  python tools/bench_e2e.py [--tickers 10000] [--years 5] [--keep DIR]
Prints one JSON line with bars, per-stage seconds, and output row counts.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_conditions(probe_dir: str, probe_mb: int = 256) -> dict:
    """Cheap box-condition telemetry attached to every e2e result so a slow
    number carries its own explanation (same-code 10x runs have measured
    2-3x apart purely on host condition — co-tenant load, I/O throttling).

    - ``loadavg``: 1/5/15-min load BEFORE the run; a fresh benchmark on an
      idle box starts near 0 — a high 5/15-min value means the box was
      already busy and wall clocks are not comparable across runs.
    - ``disk_write_mb_s``: ``probe_mb`` MB fdatasync'd sequential write
      into the benchmark's target filesystem (the lake is write-heavy; a
      throttled host reads far below the NVMe-class ~400+ MB/s). Toy-scale
      callers (the test suite) pass a small ``probe_mb`` — a 256 MB probe
      is pointless I/O where the telemetry is meaningless anyway.
    - ``cpu_spin_ms``: fixed single-core arithmetic loop; host CPU steal or
      frequency capping reads as an inflated value (idle box ~55-70 ms).
    """
    import time as _time

    la1, la5, la15 = os.getloadavg()
    probe = os.path.join(probe_dir, f"_ioprobe_{os.getpid()}")
    buf = b"\0" * (8 << 20)
    n_blocks = max(1, probe_mb // 8)
    t0 = _time.perf_counter()
    try:
        with open(probe, "wb") as f:
            for _ in range(n_blocks):
                f.write(buf)
            f.flush()
            os.fdatasync(f.fileno())
        io_sec = _time.perf_counter() - t0
    finally:
        try:
            os.remove(probe)
        except OSError:
            pass
    t0 = _time.perf_counter()
    acc = 0
    for i in range(1_000_000):
        acc += i * i
    spin_ms = (_time.perf_counter() - t0) * 1e3
    return {
        "loadavg": [round(la1, 2), round(la5, 2), round(la15, 2)],
        "disk_write_mb_s": round(n_blocks * 8.0 / io_sec, 1),
        "cpu_spin_ms": round(spin_ms, 1),
    }


def _make_bars(spark, n_tickers: int, days: list[dt.date]):
    """Deterministic OHLCV bars: ticker universe x trading days, all columns
    hash functions of (ticker, date) — no driver-side data, no RNG state;
    ~2% high-volume days so the gold HVC/stair-step stages have real work."""
    from pyspark.sql import functions as F

    from tickerlake_spark import schemas

    tickers = spark.range(n_tickers).select(
        F.format_string("T%05d", F.col("id")).alias("ticker"),
    )
    dates = spark.createDataFrame([(d,) for d in days], "date date")
    # 10k x ~1250: broadcast the calendar, fan out the ticker side
    h = F.xxhash64("ticker", "date")
    u = (F.pmod(h, F.lit(1_000_000)) / 1_000_000.0)  # uniform [0,1)
    base = 10.0 + (F.pmod(F.xxhash64("ticker"), F.lit(49_000)) / 100.0)
    close = base * (1.0 + 0.2 * (u - 0.5))
    bars = (
        tickers.repartition(64)
        .join(F.broadcast(dates))
        .select(
            "ticker",
            (
                F.lit(50_000)
                + F.pmod(h, F.lit(200_000))
                # ~2% of ticker-days spike 8-28x: HVC events for gold
                + F.when(u > 0.98, F.pmod(h, F.lit(20)) * F.lit(100_000) + 800_000)
                .otherwise(0)
            ).cast("long").alias("volume"),
            (close * (1.0 + 0.01 * (u - 0.5))).cast("float").alias("open"),
            close.cast("float").alias("close"),
            (close * (1.0 + 0.02 * u)).cast("float").alias("high"),
            (close * (1.0 - 0.02 * u)).cast("float").alias("low"),
            "date",
            F.pmod(h, F.lit(5_000)).alias("transactions"),
        )
    )
    return schemas.conform(bars, schemas.STOCKS)


def generate_bronze(spark, catalog, n_tickers: int, days: list[dt.date]) -> int:
    """Write bronze.{stocks,tickers,splits} at reference scale, distributed."""
    from pyspark.sql import functions as F

    from tickerlake_spark import schemas
    from tickerlake_spark.storage import write_table

    bars = _make_bars(spark, n_tickers, days)
    # cluster rows by date before the partitionBy write: each writer task
    # holds ~20 whole dates -> ONE file per date directory. A round-robin
    # layout would make every task write every date (64 x n_days tiny files).
    write_table(bars.repartition(64, "date"), catalog.bronze("stocks"), partition_by="date")

    meta = spark.range(n_tickers).select(
        F.format_string("T%05d", F.col("id")).alias("ticker"),
        F.format_string("Company T%05d", F.col("id")).alias("name"),
        F.lit("stocks").alias("market"),
        F.lit("us").alias("locale"),
        F.lit("XNYS").alias("primary_exchange"),
        F.when(F.col("id") % 10 == 0, "ETF").otherwise("CS").alias("type"),
        F.lit(True).alias("active"),
        F.lit("usd").alias("currency_name"),
        F.lit(None).cast("string").alias("cik"),
    )
    write_table(
        schemas.conform(meta, schemas.TICKERS), catalog.bronze("tickers")
    )

    # ~500 splits spread across tickers and the date range, but never on the
    # final day (the incremental-append benchmark needs the no-new-splits
    # path — reference: silver/incremental.py:20-66)
    # (reference: bronze/models.py:72 — ~500 rows since 2020)
    n_days = len(days) - 1
    split_dates = spark.createDataFrame(
        [(i, days[(i * 7919) % n_days]) for i in range(500)], "sid long, execution_date date"
    )
    splits = split_dates.select(
        F.format_string("S%04d", F.col("sid")).alias("id"),
        "execution_date",
        F.lit(1.0).cast("float").alias("split_from"),
        F.when(F.col("sid") % 3 == 0, 4.0).otherwise(2.0).cast("float").alias("split_to"),
        F.format_string("T%05d", F.pmod(F.col("sid") * 17, F.lit(n_tickers))).alias("ticker"),
    )
    write_table(schemas.conform(splits, schemas.SPLITS), catalog.bronze("splits"))
    return n_tickers * len(days)


def run(
    n_tickers: int = 10_000,
    years: int = 5,
    data_dir: str | None = None,
    probe_mb: int = 256,
) -> dict:
    from tickerlake_spark.session import get_spark
    from tickerlake_spark.storage import Catalog, Checkpoints, read_table

    keep = data_dir is not None
    root = data_dir or tempfile.mkdtemp(prefix="tickerlake_e2e_")
    host_before = host_conditions(os.path.dirname(root) or ".", probe_mb=probe_mb)
    spark = get_spark(app_name="tickerlake-bench-e2e")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = Catalog(root=root)
    checkpoints = Checkpoints(path=os.path.join(root, "checkpoints.json"))

    try:
        from tickerlake_spark.pipeline import run_gold, run_silver
        from tickerlake_spark.sources.calendar import trading_days
        from tickerlake_spark.storage import write_table

        end = dt.date(2025, 12, 31)
        days = trading_days(dt.date(end.year - years + 1, 1, 1), end)

        t0 = time.perf_counter()
        n_bars = generate_bronze(spark, catalog, n_tickers, days[:-4])
        t_bronze = time.perf_counter() - t0

        t0 = time.perf_counter()
        silver_summary = run_silver(spark, catalog, checkpoints)
        t_silver = time.perf_counter() - t0
        # mid-run disk probes (VERDICT r9/r10 item 8): a launch probe alone
        # can miss a throttle that sets in mid-run (and vice versa) — stamp
        # the sustained condition right after the write-heavy stages, outside
        # the timed sections.
        mid_silver = host_conditions(os.path.dirname(root) or ".", probe_mb=probe_mb)

        t0 = time.perf_counter()
        gold_summary = run_gold(
            spark, catalog, checkpoints=checkpoints, with_counts=False
        )
        t_gold = time.perf_counter() - t0
        mid_gold = host_conditions(os.path.dirname(root) or ".", probe_mb=probe_mb)

        # incremental path, TWO single-day appends: the first one after a
        # full rewrite is the MIGRATION append (it still scans the horizon
        # for window context and installs the indicator-tail state tables);
        # the second is the steady state every subsequent day runs in
        # (context from O(tickers x 205) state, no history scan). Reported
        # separately — the steady-state number is the daily operating cost
        # (baseline: 2-5 min every day, silver/main.py:242), the migration
        # number is paid once per full rewrite.
        def one_append(day_slice):
            write_table(
                _make_bars(spark, n_tickers, day_slice),
                catalog.bronze("stocks"),
                mode="append",
                partition_by="date",
            )
            t0 = time.perf_counter()
            s = run_silver(spark, catalog, checkpoints)
            t_s = time.perf_counter() - t0
            assert s["mode"] == "append", s
            t0 = time.perf_counter()
            g = run_gold(spark, catalog, checkpoints=checkpoints, with_counts=False)
            t_g = time.perf_counter() - t0
            assert g["mode"] == "incremental", g
            return s, t_s, g, t_g

        migrate_summary, t_silver_migrate, gold_incr1, t_gold_incr1 = one_append(
            days[-4:-3]
        )
        # steady state 3x (VERDICT r8 item 4: single samples showed 2-3x
        # box-condition variance across same-code runs; min+median make the
        # number reproducible without re-litigating variance every round)
        steady = [one_append([days[i]]) for i in (-3, -2, -1)]
        append_summary, _, gold_incr, _ = steady[-1]
        silver_runs = sorted(round(s[1], 2) for s in steady)
        gold_runs = sorted(round(s[3], 2) for s in steady)
        t_silver_append = silver_runs[1]  # median of 3
        t_gold_incr = gold_runs[1]

        daily_rows = read_table(spark, catalog.silver("daily_aggregates")).count()
        # observability counts OUTSIDE the timed maintenance sections: they
        # are full-table footer scans, not part of the incremental work
        vwap_rows = read_table(spark, catalog.gold("vwap_signals")).count()
        hvc_rows = read_table(spark, catalog.gold("hvc_daily")).count()
        return {
            "metric": "e2e_bronze_silver_gold",
            "unit": "sec",
            "bars": n_bars,
            "tickers": n_tickers,
            "bronze_gen_write_sec": round(t_bronze, 2),
            "silver_sec": round(t_silver, 2),
            "gold_sec": round(t_gold, 2),
            # median of the three steady-state appends; *_min and *_runs
            # carry the spread (min ~= the idle-box truth)
            "silver_append_sec": round(t_silver_append, 2),
            "gold_incremental_sec": round(t_gold_incr, 2),
            "silver_append_sec_min": silver_runs[0],
            "gold_incremental_sec_min": gold_runs[0],
            "steady_runs": {
                "silver_append_sec": silver_runs,
                "gold_incremental_sec": gold_runs,
            },
            # one-time costs of the append AFTER a full rewrite (horizon
            # scan + indicator-tail install); later appends run at the
            # steady-state numbers above
            "silver_append_migrate_sec": round(t_silver_migrate, 2),
            "gold_incremental_first_sec": round(t_gold_incr1, 2),
            "value": round(t_silver + t_gold, 2),
            # box condition: before-run probes + after-run loadavg — the
            # context a cross-run comparison needs (see host_conditions)
            "host": {
                **host_before,
                "disk_write_mb_s_after_silver": mid_silver["disk_write_mb_s"],
                "disk_write_mb_s_after_gold": mid_gold["disk_write_mb_s"],
                "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            },
            "silver_daily_rows": daily_rows,
            "gold_vwap_rows": vwap_rows,
            "gold_hvc_rows": hvc_rows,
            # per-stage wall clock from inside the jobs (VERDICT r7 item 4:
            # makes cross-box variance attributable to a table, not a guess)
            "stages": {
                "silver": silver_summary.get("timings"),
                "gold": gold_summary.get("timings"),
                "silver_append": append_summary.get("timings"),
                "gold_incremental": gold_incr.get("timings"),
                "silver_append_migrate": migrate_summary.get("timings"),
            },
            "baseline": {
                "silver_sec": [900, 1800],
                "gold_sec": [120, 300],
                "silver_append_sec": [120, 300],
                "gold_incremental_sec": [120, 300],
            },
        }
    finally:
        if not keep:
            shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tickers", type=int, default=10_000)
    ap.add_argument("--years", type=int, default=5)
    ap.add_argument("--keep", default=None, help="persist data under this dir")
    args = ap.parse_args()
    print(json.dumps(run(args.tickers, args.years, args.keep)))


if __name__ == "__main__":
    main()
