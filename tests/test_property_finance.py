"""Property-based differential tests (hypothesis) for the finance operators.

Each property runs the Spark operator on a randomly generated reference-shaped
frame and compares against an independent pure-Python oracle — the rebuild
test plan of SURVEY §5 (fixtures pin the known gotchas; properties sweep the
input space for unknown ones). Examples are kept small and few: every example
executes real Spark jobs.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tickerlake_spark.operators.indicators import compute_indicators
from tickerlake_spark.operators.resample import resample_ohlcv
from tickerlake_spark.operators.splits import apply_splits
from tickerlake_spark.operators.vwap import vwap_signals

BAR_SCHEMA = (
    "ticker string, date date, open double, high double, low double, "
    "close double, volume long, transactions long"
)
D0 = dt.date(2024, 1, 1)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def bar_rows(draw, max_days=45):
    """Unique (ticker, date) OHLCV rows with low<=open/close<=high."""
    tickers = draw(st.sets(st.sampled_from(["AAA", "BBB", "CCC"]), min_size=1))
    rows = []
    for t in sorted(tickers):
        days = draw(
            st.sets(st.integers(0, max_days - 1), min_size=1, max_size=max_days)
        )
        for d in sorted(days):
            lo = draw(st.floats(1.0, 500.0, allow_nan=False, width=32))
            hi = lo + draw(st.floats(0.0, 50.0, allow_nan=False, width=32))
            op = lo + draw(st.floats(0.0, 1.0, allow_nan=False, width=32)) * (hi - lo)
            cl = lo + draw(st.floats(0.0, 1.0, allow_nan=False, width=32)) * (hi - lo)
            vol = draw(st.integers(0, 10**9))
            rows.append(
                (t, D0 + dt.timedelta(days=d), float(op), float(hi), float(lo),
                 float(cl), vol, draw(st.integers(0, 10**6)))
            )
    return rows


@st.composite
def split_rows(draw, tickers=("AAA", "BBB", "CCC"), max_days=45):
    n = draw(st.integers(0, 4))
    seen = set()
    rows = []
    for _ in range(n):
        t = draw(st.sampled_from(list(tickers)))
        d = draw(st.integers(1, max_days))
        if (t, d) in seen:
            continue
        seen.add((t, d))
        frm = float(draw(st.sampled_from([1, 2, 3, 5])))
        to = float(draw(st.sampled_from([1, 2, 4, 10])))
        rows.append((t, D0 + dt.timedelta(days=d), frm, to))
    return rows


@settings(**SETTINGS)
@given(bars=bar_rows(), splits=split_rows())
def test_apply_splits_matches_python_oracle(spark, bars, splits):
    sdf = spark.createDataFrame(bars, BAR_SCHEMA)
    spdf = spark.createDataFrame(
        splits or [],
        "ticker string, execution_date date, split_from double, split_to double",
    )
    got = {
        (r.ticker, r.date): r
        for r in apply_splits(sdf, spdf).collect()
    }
    assert len(got) == len(bars)
    by_ticker = defaultdict(list)
    for t, d, frm, to in splits:
        by_ticker[t].append((d, frm / to))
    for t, d, op, hi, lo, cl, vol, tx in bars:
        factor = 1.0
        # multiply in execution_date order (the operator's documented fold order)
        for ed, f in sorted(by_ticker.get(t, [])):
            if d < ed:
                factor *= f
        r = got[(t, d)]
        assert math.isclose(r.close, cl * factor, rel_tol=1e-12), (t, d)
        assert math.isclose(r.high, hi * factor, rel_tol=1e-12)
        assert r.volume == int(math.floor(vol / factor))


@settings(**SETTINGS)
@given(bars=bar_rows())
def test_resample_weekly_invariants(spark, bars):
    sdf = spark.createDataFrame(bars, BAR_SCHEMA)
    out = resample_ohlcv(sdf, "week").collect()
    groups = defaultdict(list)
    for row in bars:
        t, d = row[0], row[1]
        monday = d - dt.timedelta(days=d.weekday())
        groups[(t, monday)].append(row)
    assert len(out) == len(groups)
    for r in out:
        rows = groups[(r.ticker, r.date)]
        assert r.date.weekday() == 0, "weekly bucket label must be a Monday"
        assert math.isclose(r.high, max(x[3] for x in rows), rel_tol=1e-12)
        assert math.isclose(r.low, min(x[4] for x in rows), rel_tol=1e-12)
        assert r.volume == sum(x[6] for x in rows)
        first = min(rows, key=lambda x: x[1])
        last = max(rows, key=lambda x: x[1])
        assert math.isclose(r.open, first[2], rel_tol=1e-12)
        assert math.isclose(r.close, last[5], rel_tol=1e-12)


@settings(**SETTINGS)
@given(bars=bar_rows(max_days=60))
def test_indicators_sma20_null_padding_and_value(spark, bars):
    sdf = spark.createDataFrame(bars, BAR_SCHEMA)
    out = compute_indicators(sdf).collect()
    series = defaultdict(list)
    for t, d, op, hi, lo, cl, vol, tx in sorted(bars, key=lambda x: (x[0], x[1])):
        series[t].append((d, cl))
    got = {(r.ticker, r.date): r for r in out}
    for t, pts in series.items():
        for i, (d, _) in enumerate(pts):
            r = got[(t, d)]
            if i < 19:
                assert r.sma_20 is None, f"sma_20 must be null until 20 rows ({t} {d})"
            else:
                expect = sum(c for _, c in pts[i - 19 : i + 1]) / 20.0
                assert math.isclose(r.sma_20, expect, rel_tol=1e-9)


@settings(**SETTINGS)
@given(bars=bar_rows(max_days=40))
def test_vwap_cumulative_and_signal_consistency(spark, bars):
    sdf = spark.createDataFrame(bars, BAR_SCHEMA)
    out = vwap_signals(sdf).collect()
    cum = defaultdict(lambda: [0.0, 0.0])  # (ticker, year) -> [sum_pv, sum_v]
    expected = {}
    for t, d, op, hi, lo, cl, vol, tx in sorted(bars, key=lambda x: (x[0], x[1])):
        if vol <= 0:
            continue
        key = (t, d.year)
        cum[key][0] += cl * vol
        cum[key][1] += vol
        expected[(t, d)] = cum[key][0] / cum[key][1]
    for r in out:
        exp = expected[(r.ticker, r.date)]
        assert math.isclose(r.ytd_vwap, exp, rel_tol=1e-9), (r.ticker, r.date)
        assert r.above_both == (bool(r.above_ytd_vwap) and bool(r.above_qtd_vwap))
        assert r.above_ytd_vwap == (r.close > r.ytd_vwap)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2", "k3"]),
            st.integers(0, 20),
            st.integers(0, 100),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_keep_last_matches_python(spark, rows):
    from tickerlake_spark.operators.dedup import dedup_keep_last

    # make (key, seq) unique so "last" is well-defined
    uniq = {}
    for k, seq, v in rows:
        uniq[(k, seq)] = v
    data = [(k, s, v) for (k, s), v in uniq.items()]
    sdf = spark.createDataFrame(data, "key string, seq long, val long")
    got = {r.key: (r.seq, r.val) for r in dedup_keep_last(sdf, ["key"], ["seq"]).collect()}
    expect = {}
    for k, s, v in data:
        if k not in expect or s > expect[k][0]:
            expect[k] = (s, v)
    assert got == expect
