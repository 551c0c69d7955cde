"""Pinned-semantics fixture tests for the finance operators (SURVEY §4.3).

Hand-built reference-shaped frames exercise exactly the gotchas FIXTURES.md
lists: stacked splits (product path), zero-split ticker (null-join path),
truncating volume division, null-padded rolling windows, Monday-anchored
weeks, VWAP quarter resets, stair-step islands.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tickerlake_spark.operators.hvc import hvc_events, stairstep_patterns
from tickerlake_spark.operators.indicators import compute_indicators
from tickerlake_spark.operators.resample import resample_ohlcv
from tickerlake_spark.operators.splits import apply_splits
from tickerlake_spark.operators.vwap import vwap_signals

D = dt.date
BAR_SCHEMA = (
    "ticker string, date date, open double, high double, low double, "
    "close double, volume long, transactions long"
)


def bars(spark, rows):
    return spark.createDataFrame(rows, BAR_SCHEMA)


def splits_df(spark, rows):
    return spark.createDataFrame(
        rows, "ticker string, execution_date date, split_from double, split_to double"
    )


class TestApplySplits:
    def test_stacked_splits_product_and_truncation(self, spark):
        # AAPL: 1:2 forward on 01-10 and 1:4 forward on 01-20 -> dates before
        # both get factor 0.5 * 0.25 = 0.125; between: 0.25; after: 1.0
        stocks = bars(
            spark,
            [
                ("AAPL", D(2024, 1, 5), 100.0, 110.0, 90.0, 104.0, 1001, 11),
                ("AAPL", D(2024, 1, 15), 26.0, 27.0, 25.0, 26.0, 4000, 40),
                ("AAPL", D(2024, 1, 25), 6.5, 6.8, 6.4, 6.6, 16000, 160),
            ],
        )
        sp = splits_df(
            spark,
            [
                ("AAPL", D(2024, 1, 10), 1.0, 2.0),
                ("AAPL", D(2024, 1, 20), 1.0, 4.0),
            ],
        )
        out = {r.date: r for r in apply_splits(stocks, sp).collect()}
        r5 = out[D(2024, 1, 5)]
        assert r5.close == pytest.approx(104.0 * 0.125)
        # 1001 / 0.125 = 8008 exactly
        assert r5.volume == 8008 and r5.transactions == 88
        r15 = out[D(2024, 1, 15)]
        assert r15.close == pytest.approx(26.0 * 0.25)
        assert r15.volume == 16000
        r25 = out[D(2024, 1, 25)]
        assert r25.close == pytest.approx(6.6) and r25.volume == 16000

    def test_truncating_division(self, spark):
        # reverse split 3:1 -> factor 3.0; volume 1000/3 = 333.33 -> 333
        stocks = bars(spark, [("X", D(2024, 1, 1), 1.0, 1.0, 1.0, 1.0, 1000, 10)])
        sp = splits_df(spark, [("X", D(2024, 2, 1), 3.0, 1.0)])
        r = apply_splits(stocks, sp).first()
        assert r.volume == 333 and r.transactions == 3
        assert r.close == pytest.approx(3.0)

    def test_no_split_ticker_passthrough(self, spark):
        stocks = bars(spark, [("Z", D(2024, 1, 1), 5.0, 6.0, 4.0, 5.5, 777, 7)])
        sp = splits_df(spark, [("OTHER", D(2024, 1, 5), 1.0, 2.0)])
        r = apply_splits(stocks, sp).first()
        assert r.close == 5.5 and r.volume == 777 and r.transactions == 7


class TestResample:
    def test_weekly_monday_anchor_and_ordered_first_last(self, spark):
        # 2024-01-03 is Wednesday, 2024-01-08 is Monday -> two buckets
        stocks = bars(
            spark,
            [
                ("T", D(2024, 1, 3), 10.0, 12.0, 9.0, 11.0, 100, 1),
                ("T", D(2024, 1, 5), 11.0, 13.0, 10.0, 12.0, 200, 2),
                ("T", D(2024, 1, 8), 12.0, 14.0, 11.0, 13.0, 300, 3),
            ],
        )
        out = {r.date: r for r in resample_ohlcv(stocks, "week").collect()}
        assert set(out) == {D(2024, 1, 1), D(2024, 1, 8)}
        w1 = out[D(2024, 1, 1)]
        assert (w1.open, w1.close) == (10.0, 12.0)  # first/last by date
        assert (w1.high, w1.low) == (13.0, 9.0)
        assert (w1.volume, w1.transactions) == (300, 3)

    def test_monthly(self, spark):
        stocks = bars(
            spark,
            [
                ("T", D(2024, 1, 31), 1.0, 2.0, 0.5, 1.5, 10, 1),
                ("T", D(2024, 2, 1), 1.5, 3.0, 1.0, 2.5, 20, 2),
            ],
        )
        out = {r.date: r for r in resample_ohlcv(stocks, "month").collect()}
        assert set(out) == {D(2024, 1, 1), D(2024, 2, 1)}

    def test_bad_period(self, spark):
        with pytest.raises(ValueError, match="period"):
            resample_ohlcv(bars(spark, []), "day")


class TestIndicators:
    def test_null_padding_and_truncation(self, spark):
        rows = [
            ("T", D(2024, 1, 1) + dt.timedelta(days=i), 1.0, 2.0 + i, 1.0, 1.0 + i, 10 + i, 1)
            for i in range(25)
        ]
        out = (
            compute_indicators(bars(spark, rows))
            .orderBy("date")
            .collect()
        )
        # sma_20 null for first 19 rows, present from row 20
        assert all(r.sma_20 is None for r in out[:19])
        assert out[19].sma_20 == pytest.approx(sum(1.0 + i for i in range(20)) / 20)
        # sma_50 never fills with 25 rows
        assert all(r.sma_50 is None for r in out)
        # atr_14: tr row0 = high-low = 1.0+0; later rows tr = max(h-l, |h-pc|, |l-pc|)
        assert all(r.atr_14 is None for r in out[:13])
        assert out[13].atr_14 is not None
        # volume_ma_20 truncated long: mean(10..29) = 19.5 -> 19
        assert out[19].volume_ma_20 == 19
        assert out[19].volume_ratio == pytest.approx((10 + 19) / 19)

    def test_null_in_window_yields_null_mean_default_path(self, spark):
        """A null close inside a window must null the rolling mean (Polars
        min_samples counts NON-NULL values) on the default path; the
        assume_non_null fast path is explicitly allowed to diverge here and
        both paths must agree wherever no null is in frame."""
        rows = [
            ("T", D(2024, 1, 1) + dt.timedelta(days=i), 1.0, 2.0 + i, 1.0,
             None if i == 5 else 1.0 + i, 10 + i, 1)
            for i in range(46)
        ]
        safe = {
            r.date: r.sma_20
            for r in compute_indicators(bars(spark, rows)).collect()
        }
        fast = {
            r.date: r.sma_20
            for r in compute_indicators(
                bars(spark, rows), assume_non_null=True
            ).collect()
        }
        dates = sorted(safe)
        # rows 19..24 have the null row in frame -> null on the safe path
        for d in dates[19:25]:
            assert safe[d] is None, d
            assert fast[d] is not None  # the documented divergence
        # from row 25 the null has left every 20-row frame: paths agree
        for d in dates[25:]:
            assert safe[d] == fast[d] != None  # noqa: E711

    def test_atr_first_row_fallback(self, spark):
        rows = [
            ("T", D(2024, 1, 1) + dt.timedelta(days=i), 1.0, 10.0, 2.0, 5.0, 10, 1)
            for i in range(14)
        ]
        out = compute_indicators(bars(spark, rows)).orderBy("date").collect()
        # constant bars: tr = high-low = 8 everywhere (incl. first row fallback)
        assert out[13].atr_14 == pytest.approx(8.0)


class TestVwap:
    def test_filters_and_period_resets(self, spark):
        rows = [
            # Q1: two days
            ("T", D(2024, 3, 28), 0.0, 0.0, 0.0, 10.0, 100, 0),
            ("T", D(2024, 3, 29), 0.0, 0.0, 0.0, 20.0, 100, 0),
            # Q2 starts: QTD resets, YTD continues
            ("T", D(2024, 4, 1), 0.0, 0.0, 0.0, 30.0, 100, 0),
            # excluded: zero volume, null close
            ("T", D(2024, 4, 2), 0.0, 0.0, 0.0, 40.0, 0, 0),
            ("T", D(2024, 4, 3), 0.0, 0.0, 0.0, None, 100, 0),
        ]
        df = spark.createDataFrame(
            rows,
            "ticker string, date date, open double, high double, low double, "
            "close double, volume long, transactions long",
        )
        out = {r.date: r for r in vwap_signals(df, dt.datetime(2026, 1, 1)).collect()}
        assert set(out) == {D(2024, 3, 28), D(2024, 3, 29), D(2024, 4, 1)}
        assert out[D(2024, 3, 29)].ytd_vwap == pytest.approx(15.0)
        assert out[D(2024, 4, 1)].ytd_vwap == pytest.approx(20.0)
        assert out[D(2024, 4, 1)].qtd_vwap == pytest.approx(30.0)  # reset
        assert out[D(2024, 4, 1)].above_ytd_vwap is True
        assert out[D(2024, 4, 1)].above_qtd_vwap is False  # close == vwap
        assert out[D(2024, 4, 1)].above_both is False
        assert out[D(2024, 3, 28)].calculated_at == dt.datetime(2026, 1, 1)


class TestStairstep:
    def test_islands_and_direction(self, spark):
        hvc = spark.createDataFrame(
            [("T", D(2024, 1, i)) for i in (1, 2, 3, 5, 6)], "ticker string, date date"
        )
        closes = spark.createDataFrame(
            [
                ("T", D(2024, 1, 1), 10.0),
                ("T", D(2024, 1, 2), 11.0),
                ("T", D(2024, 1, 3), 12.0),
                ("T", D(2024, 1, 5), 9.0),   # break (falls)
                ("T", D(2024, 1, 6), 9.5),
                ("T", D(2024, 1, 7), 99.0),  # not an HVC day - ignored
            ],
            "ticker string, date date, close double",
        )
        pats = stairstep_patterns(hvc, closes, min_steps=2, direction="up").collect()
        assert len(pats) == 2
        by_start = {p.start_date: p for p in pats}
        p1 = by_start[D(2024, 1, 1)]
        assert p1.hvc_count == 3 and p1.first_close == 10.0 and p1.last_close == 12.0
        assert p1.gain_pct == pytest.approx(20.0)
        assert p1.dates_str == "2024-01-01,2024-01-02,2024-01-03"
        p2 = by_start[D(2024, 1, 5)]
        assert p2.hvc_count == 2

    def test_min_steps_filters(self, spark):
        hvc = spark.createDataFrame(
            [("T", D(2024, 1, 1)), ("T", D(2024, 1, 2))], "ticker string, date date"
        )
        closes = spark.createDataFrame(
            [("T", D(2024, 1, 1), 1.0), ("T", D(2024, 1, 2), 2.0)],
            "ticker string, date date, close double",
        )
        assert stairstep_patterns(hvc, closes, min_steps=3).count() == 0
        with pytest.raises(ValueError, match="direction"):
            stairstep_patterns(hvc, closes, direction="sideways")


class TestHvcEvents:
    def test_threshold_filter(self, spark):
        ind = spark.createDataFrame(
            [("T", D(2024, 1, 1), 3.5, 100), ("T", D(2024, 1, 2), 1.0, 100)],
            "ticker string, date date, volume_ratio double, volume_ma_20 long",
        )
        daily = spark.createDataFrame(
            [("T", D(2024, 1, 1), 350), ("T", D(2024, 1, 2), 100)],
            "ticker string, date date, volume long",
        )
        out = hvc_events(ind, daily, threshold=3.0).collect()
        assert len(out) == 1
        assert out[0].volume_avg_ratio == 3.5 and out[0].volume_avg == 100
