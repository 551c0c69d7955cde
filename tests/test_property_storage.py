"""Property-based tests for the lakehouse mutation primitives.

Random batch sequences against pure-Python oracles:
- upsert_table: any sequence of keyed update batches must leave the table
  equal to a dict fold (last write per key wins), partitioned or not;
- incremental aggregate maintenance: merging per-batch partial states must
  equal aggregating everything at once, for ANY partition of the rows into
  batches (the associativity/commutativity the design depends on).

Examples are few and small — every example runs real Spark jobs.
"""

from __future__ import annotations

import pytest

import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def update_batches(draw):
    """1-4 batches of (id, part, value) rows, ids unique within a batch."""
    n_batches = draw(st.integers(1, 4))
    batches = []
    for _ in range(n_batches):
        ids = sorted(draw(st.sets(st.integers(0, 14), min_size=1, max_size=8)))
        batch = [
            (
                i,
                f"p{draw(st.integers(0, 2))}",
                draw(st.integers(-1000, 1000)) / 4.0,
            )
            for i in ids
        ]
        batches.append(batch)
    return batches


@settings(**SETTINGS)
@given(batches=update_batches(), partitioned=st.booleans())
def test_upsert_sequence_equals_dict_fold(spark, tmp_path_factory, batches, partitioned):
    from tickerlake_spark.storage.upsert import upsert_table

    path = str(tmp_path_factory.mktemp("upsert_prop") / "t")
    oracle: dict[int, tuple[str, float]] = {}
    for batch in batches:
        df = spark.createDataFrame(batch, "id long, part string, v double")
        upsert_table(
            spark,
            path,
            df,
            keys=["id"],
            partition_by="part" if partitioned else None,
        )
        for i, p, v in batch:
            oracle[i] = (p, v)

    got = {
        r.id: (r.part, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == oracle


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # group
            st.integers(-100, 100),  # value
            st.integers(0, 2),  # batch assignment
        ),
        min_size=1,
        max_size=40,
    )
)
def test_incremental_agg_invariant_under_batching(spark, rows):
    from pyspark.sql import functions as F

    from tickerlake_spark.operators.incremental_agg import (
        aggregate_delta,
        merge_aggregates,
    )

    measures = {
        "s": ("sum", "v"),
        "c": ("count", "v"),
        "mn": ("min", "v"),
        "mx": ("max", "v"),
    }
    df = spark.createDataFrame(
        [(g, float(v), b) for g, v, b in rows], "g long, v double, b long"
    )

    state = None
    for b in range(3):
        batch = df.filter(F.col("b") == b).drop("b")
        if batch.rdd.isEmpty():
            continue
        state = merge_aggregates(
            state, aggregate_delta(batch, ["g"], measures), ["g"], measures
        )

    oracle = defaultdict(list)
    for g, v, _b in rows:
        oracle[g].append(v)

    assert state is not None
    got = {r.g: (r.s, r.c, r.mn, r.mx) for r in state.collect()}
    assert set(got) == set(oracle)
    for g, vals in oracle.items():
        s, c, mn, mx = got[g]
        assert math.isclose(s, sum(vals), abs_tol=1e-9)
        assert c == len(vals)
        assert mn == min(vals) and mx == max(vals)


@st.composite
def day_batches(draw):
    """A random ordered partition of 30 trading days into 1-4 ingestion
    batches (bronze arrival order = calendar order, as the file source
    delivers), plus a per-day volume profile with occasional spikes."""
    import datetime as dt

    from tickerlake_spark.sources.calendar import trading_days

    days = trading_days(dt.date(2024, 1, 2), dt.date(2024, 2, 13))
    n_batches = draw(st.integers(min_value=1, max_value=4))
    if n_batches == 1:
        cuts = []
    else:
        cuts = sorted(
            draw(
                st.lists(
                    st.integers(min_value=1, max_value=len(days) - 1),
                    min_size=n_batches - 1,
                    max_size=n_batches - 1,
                    unique=True,
                )
            )
        )
    bounds = [0, *cuts, len(days)]
    batches = [days[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]
    spikes = draw(st.sets(st.integers(min_value=0, max_value=len(days) - 1)))
    return days, batches, spikes


@given(case=day_batches())
@settings(max_examples=3, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.slow
def test_silver_maintenance_batches_equal_full_recompute(spark, tmp_path_factory, case):
    """ANY partition of the bar history into sequential micro-batches pushed
    through streaming/medallion.silver_maintenance_batch must leave daily +
    weekly aggregates and daily indicators equal to one full recompute —
    the invariant the streaming medallion and the silver append path both
    rest on."""
    from pyspark.sql import functions as F

    from tickerlake_spark import schemas
    from tickerlake_spark.operators.indicators import compute_indicators
    from tickerlake_spark.operators.resample import resample_ohlcv
    from tickerlake_spark.storage import Catalog, read_table, write_table
    from tickerlake_spark.streaming.medallion import silver_maintenance_batch

    days, batches, spikes = case
    tmp = tmp_path_factory.mktemp("prop_silver")
    cat = Catalog(root=str(tmp / "data"))

    def bars(day_list):
        rows = [
            ("AAA", (12000 if i in spikes else 1000) + i, 99.0,
             100.0 + (i * 7 % 13), 103.0, 97.0, d, 5)
            for i, d in enumerate(days) if d in set(day_list)
        ]
        return spark.createDataFrame(
            rows,
            "ticker string, volume long, open float, close float, high float, "
            "low float, date date, transactions long",
        )

    splits = spark.createDataFrame(
        [("s1", days[10], 1.0, 2.0, "AAA")],
        "id string, execution_date date, split_from float, split_to float, ticker string",
    )
    write_table(schemas.conform(splits, schemas.SPLITS), cat.bronze("splits"))

    for b in batches:
        silver_maintenance_batch(spark, cat, bars(b))

    def rows_of(df):
        # column order is storage-layout-dependent (partition column reads
        # last on Hive-partitioned tables) - compare by sorted column name
        df = df.select(*sorted(df.columns))
        rounded = df.select(
            *[F.round(c, 9).alias(c) if t == "double" else F.col(c) for c, t in df.dtypes]
        )
        return sorted(
            map(tuple, rounded.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    from tickerlake_spark.operators.splits import apply_splits

    expected_daily = schemas.conform(
        apply_splits(schemas.conform(bars(days), schemas.AGGREGATES), splits),
        schemas.AGGREGATES,
    )
    assert rows_of(read_table(spark, cat.silver("daily_aggregates"))) == rows_of(expected_daily)
    assert rows_of(read_table(spark, cat.silver("weekly_aggregates"))) == rows_of(
        schemas.conform(resample_ohlcv(expected_daily, "week"), schemas.AGGREGATES)
    )
    assert rows_of(read_table(spark, cat.silver("daily_indicators"))) == rows_of(
        schemas.conform(compute_indicators(expected_daily), schemas.INDICATORS)
    )


@st.composite
def gold_append_case(draw):
    """Random cut point + random HVC spike days for an incremental-gold
    parity run (threshold lowered so tiny fixtures produce events)."""
    import datetime as dt

    from tickerlake_spark.sources.calendar import trading_days

    days = trading_days(dt.date(2024, 1, 2), dt.date(2024, 2, 20))
    cut = draw(st.integers(min_value=22, max_value=len(days) - 2))
    spikes = draw(
        st.sets(st.integers(min_value=21, max_value=len(days) - 1), max_size=8)
    )
    return days, cut, spikes


@given(case=gold_append_case())
@settings(max_examples=2, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_incremental_gold_equals_full_for_random_appends(
    spark, tmp_path_factory, case
):
    """For ANY cut point and ANY spike pattern, silver append + incremental
    gold must equal the from-scratch rebuild on every gold table."""
    import datetime as dt

    from pyspark.sql import functions as F

    from tickerlake_spark.pipeline import run_bronze, run_gold, run_silver
    from tickerlake_spark.sources.market import InMemoryMarketSource
    from tickerlake_spark.storage import Catalog, Checkpoints, read_table

    days, cut, spikes = case
    tmp = tmp_path_factory.mktemp("prop_gold")

    def bars(d, i):
        vol = 9000 if i in spikes else 1000
        close = 100.0 + (i * 7 % 13)
        ms = int(dt.datetime(d.year, d.month, d.day).timestamp() * 1000)
        return [
            {"ticker": "AAA", "volume": vol, "open": close - 1.0,
             "close": close, "high": close + 2.0, "low": close - 2.0,
             "window_start": ms, "transactions": 5}
        ]

    def src(upto):
        return InMemoryMarketSource(
            bars_by_date={d: bars(d, i) for i, d in enumerate(days) if i < upto},
            ticker_rows=[{"ticker": "AAA", "name": "A", "type": "CS",
                          "active": True, "market": "stocks", "locale": "us",
                          "primary_exchange": "X", "currency_name": "usd",
                          "cik": "1"}],
            split_rows=[],
        )

    stamp = dt.datetime(2024, 3, 1)
    envs = {}
    for label, steps in (("a", [cut, len(days)]), ("b", [len(days)])):
        cat = Catalog(root=str(tmp / label))
        cp = Checkpoints(str(tmp / f"cp_{label}.json"))
        for upto in steps:
            run_bronze(spark, src(upto), cat, cp, days[0], days[upto - 1])
            run_silver(spark, cat, cp)
            run_gold(spark, cat, hvc_threshold=1.5, min_steps=2,
                     calculated_at=stamp, checkpoints=cp)
        envs[label] = cat

    def rows_of(cat, table):
        df = read_table(spark, cat.gold(table))
        rounded = df.select(
            *[F.round(c, 9).alias(c) if t == "double" else F.col(c) for c, t in df.dtypes]
        )
        return sorted(map(tuple, rounded.collect()))

    for table in ("vwap_signals", "hvc_daily", "hvc_weekly", "hvc_monthly",
                  "stairstep_up", "stairstep_down", "best_patterns",
                  "best_patterns_down"):
        assert rows_of(envs["a"], table) == rows_of(envs["b"], table), table


# ---------------------------------------------------------------------------
# SCD2: random update sequences vs a pure-Python state machine


@st.composite
def scd2_batches(draw):
    """2-4 update batches over keys k0..k4 with strictly increasing
    effective dates; values from a tiny alphabet so changes AND no-ops
    both occur; each batch has unique keys."""
    n_batches = draw(st.integers(2, 4))
    out = []
    for b in range(n_batches):
        keys = sorted(draw(st.sets(st.integers(0, 4), min_size=1, max_size=5)))
        out.append(
            [
                (f"k{k}", draw(st.sampled_from(["a", "b", "c"])), b)
                for k in keys
            ]
        )
    return out


@settings(**SETTINGS)
@given(batches=scd2_batches())
def test_scd2_sequence_matches_state_machine(spark, tmp_path_factory, batches):
    """Any update sequence: stored history == a dict-of-version-lists fold
    (close open version on change, append new), and exactly one open
    version per ever-seen key."""
    import datetime as dt

    from pyspark.sql import functions as F

    from tickerlake_spark.storage.scd2 import scd2_apply, scd2_current

    path = str(tmp_path_factory.mktemp("scd2_prop") / "dim")
    d0 = dt.date(2024, 1, 1)
    oracle: dict[str, list] = {}  # key -> [[val, from, to], ...]
    for b, batch in enumerate(batches):
        eff = d0 + dt.timedelta(days=30 * b)
        df = spark.createDataFrame(
            [(k, v, eff) for k, v, _ in batch],
            "k string, val string, effective_date date",
        )
        scd2_apply(spark, path, df, keys=["k"], tracked=["val"])
        for k, v, _ in batch:
            hist = oracle.setdefault(k, [])
            if not hist:
                hist.append([v, eff, None])
            elif hist[-1][0] != v:
                hist[-1][2] = eff
                hist.append([v, eff, None])

    stored = defaultdict(list)
    for r in (
        spark.read.parquet(path).orderBy("k", "valid_from").collect()
    ):
        stored[r.k].append([r.val, r.valid_from, r.valid_to])
    assert dict(stored) == oracle
    cur = scd2_current(spark, path)
    assert cur.count() == len(oracle)
    assert cur.filter(F.col("valid_to").isNotNull()).count() == 0


# ---------------------------------------------------------------------------
# snapshot_diff: random old/new snapshots vs a dict oracle


@st.composite
def two_snapshots(draw):
    keys = sorted(draw(st.sets(st.integers(0, 20), min_size=1, max_size=12)))
    vals = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
    old = {k: draw(vals) for k in keys if draw(st.booleans())}
    new = {k: draw(vals) for k in keys if draw(st.booleans())}
    return old, new


@settings(**SETTINGS)
@given(snaps=two_snapshots())
def test_snapshot_diff_matches_dict_oracle(spark, snaps):
    from tickerlake_spark.storage.diff import snapshot_diff

    old, new = snaps
    odf = spark.createDataFrame(
        [(k, v) for k, v in old.items()] or [(None, None)], "k long, v string"
    ).filter("k is not null")
    ndf = spark.createDataFrame(
        [(k, v) for k, v in new.items()] or [(None, None)], "k long, v string"
    ).filter("k is not null")
    got = {
        r.k: r.change
        for r in snapshot_diff(odf, ndf, keys=["k"], include_unchanged=True).collect()
    }
    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        elif old[k] != new[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"  # incl. NULL == NULL (null-safe compare)
    assert got == want
