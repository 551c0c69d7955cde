"""Focused equivalence tests for the round-11 operator-internal optimizations.

Two changes rewired operator internals without (by construction) changing any
result; these tests pin the construction:

1. ``rolling_mean_strict`` / ``compute_indicators`` compute the masked
   trailing mean as ``sum(col) over frame / n`` instead of
   ``avg(col) over frame`` (half the aggregation-buffer width per frame row).
   Under the count==n mask the two must be BITWISE identical — same
   left-to-right accumulation, division by the same n — so the test compares
   raw IEEE-754 bit patterns, not approx.

2. The finance chain runs on the raw bigint ``l_suppkey`` ticker
   (``long_ticker=True``) and casts back to string only in the final
   projection. The cast is injective, so the whole bars → splits → indicators
   chain must produce row-identical output vs the string-keyed chain.

3. On the ``assume_non_null`` fast path with an integral volume column, the
   volume MA-20 is computed as a cumulative-sum difference
   (``cumsum - lag(cumsum, 20)``) instead of a 20-row sliding frame. Integer
   arithmetic has no reassociation error, so the trailing sum — and hence the
   floor-divided MA and the ratio built on it — must be EXACTLY equal to the
   sliding-frame formulation.

4. ``apply_splits`` computes the split factor with ONE conditional
   ``aggregate`` HOF instead of ``aggregate(filter(...))``. The fused walk
   multiplies the same kept elements in the same sorted order (skipped
   elements return the accumulator unchanged), so every adjusted value must
   be BITWISE identical to the two-HOF formulation.

5. ``compute_indicators`` materializes its O(1) running frames (lag, ordinal,
   cumsum) once in a first Window pass and feeds the sliding frames from the
   columns — two WindowExec passes total on the fast path (was three), with
   one ``row_number`` instance instead of five. Same expressions over the
   same spec => identical values.
"""

from __future__ import annotations

import struct

from pyspark.sql import Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import rolling_mean_strict, rolling_window
from tickerlake_spark.operators.indicators import compute_indicators
from tickerlake_spark.operators.splits import apply_splits
from tickerlake_spark.plans.finance import stock_bars, stock_splits


def _bits(x):
    """IEEE-754 bit pattern (None stays None) — stricter than float ==."""
    return None if x is None else struct.pack("<d", x)


class TestSumOverNBitwiseEqualsAvg:
    def test_rolling_mean_strict_matches_avg_bitwise(self, spark):
        # Float-hostile values: mixed magnitudes make the mean sensitive to
        # any change in accumulation order or intermediate rounding, so a
        # bitwise match is meaningful evidence the two formulations share
        # the exact same arithmetic.
        vals = [
            1e15, 3.0, -1e15, 0.1, 7e-8, 2.5, -0.1, 1e12, -1e12, 0.3,
            123456.789, -7e-9, 9.99e14, 1.0 / 3.0, 2.0 / 7.0, -1e15, 1e15,
            0.7, 11.11, -3.3,
        ]
        rows = [("T", i, v) for i, v in enumerate(vals)] + [
            ("U", i, v * 1.000000001 - 0.25) for i, v in enumerate(vals[:9])
        ]
        df = spark.createDataFrame(rows, "ticker string, seq int, x double")

        for n in (3, 7):
            w = rolling_window(["ticker"], ["seq"], n)
            ref = F.when(F.count("x").over(w) == n, F.avg("x").over(w))
            got = df.select(
                "ticker",
                "seq",
                rolling_mean_strict("x", n, ["ticker"], ["seq"]).alias("opt"),
                ref.alias("ref"),
            ).collect()
            assert any(r.ref is not None for r in got)
            # first n-1 rows per ticker must stay null (the strict mask)
            assert all(r.opt is None for r in got if r.seq < n - 1)
            for r in got:
                assert _bits(r.opt) == _bits(r.ref), (n, r)

    def test_indicator_ordinal_fast_path_matches_avg_bitwise(self, spark):
        # The assume_non_null fast path masks on a shared row_number instead
        # of per-frame counts; its sum/n must also match avg bitwise.
        vals = [100.0 + ((i * 37) % 19) * 1.37 - (i % 5) * 1e-7 for i in range(230)]
        rows = [
            ("T", f"2023-{(i // 28) % 12 + 1:02d}-{i % 28 + 1:02d}", v)
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "ticker string, ds string, close double").select(
            "ticker",
            F.col("ds").cast("date").alias("date"),
            "close",
            F.col("close").alias("high"),
            F.col("close").alias("low"),
            F.lit(1000).cast("long").alias("volume"),
        )
        out = compute_indicators(df, assume_non_null=True)
        w1 = Window.partitionBy("ticker").orderBy("date")
        for col, n in (("sma_20", 20), ("sma_50", 50), ("sma_200", 200)):
            ref = F.when(
                F.row_number().over(w1) >= n,
                F.avg("close").over(rolling_window(["ticker"], ["date"], n)),
            )
            got = out.join(df.select("ticker", "date", "close"), ["ticker", "date"]).select(
                F.col(col).alias("opt"), ref.alias("ref")
            ).collect()
            assert sum(r.ref is not None for r in got) == len(vals) - n + 1
            for r in got:
                assert _bits(r.opt) == _bits(r.ref), (col, r)


class TestLongTickerChainParity:
    def test_bigint_chain_row_identical_to_string_chain(self, spark, sf_dir):
        # Full q34-shaped chain (bars -> split adjust -> indicators) keyed on
        # the raw bigint vs the string ticker: rows must be identical once
        # the bigint side applies its final-projection cast.
        def chain(long_ticker):
            adj = apply_splits(
                stock_bars(spark, sf_dir, long_ticker=long_ticker),
                stock_splits(spark, sf_dir, long_ticker=long_ticker),
            )
            ind = compute_indicators(adj, assume_non_null=True)
            return ind.withColumn("ticker", F.col("ticker").cast("string"))

        a = chain(True).collect()
        b = chain(False).collect()
        assert len(a) == len(b) > 0
        key = lambda r: (r.ticker, r.date)
        a.sort(key=key)
        b.sort(key=key)
        for ra, rb in zip(a, b):
            da, db = ra.asDict(), rb.asDict()
            assert set(da) == set(db)
            for k in da:
                va, vb = da[k], db[k]
                if isinstance(va, float) or isinstance(vb, float):
                    assert _bits(va) == _bits(vb), (k, ra, rb)
                else:
                    assert va == vb, (k, ra, rb)

    def test_bigint_splits_match_string_splits(self, spark, sf_dir):
        a = sorted(
            stock_splits(spark, sf_dir, long_ticker=True)
            .withColumn("ticker", F.col("ticker").cast("string"))
            .collect()
        )
        b = sorted(stock_splits(spark, sf_dir, long_ticker=False).collect())
        assert a == b and len(a) > 0


class TestCumsumVolumeMA:
    def _bars(self, spark, volumes, vol_type="long"):
        rows = [
            (t, f"2023-{(i // 28) % 12 + 1:02d}-{i % 28 + 1:02d}", 100.0 + i, float(v))
            for t, vols in volumes.items()
            for i, v in enumerate(vols)
        ]
        df = spark.createDataFrame(
            rows, "ticker string, ds string, close double, volume double"
        )
        return df.select(
            "ticker",
            F.col("ds").cast("date").alias("date"),
            F.col("close").alias("high"),
            F.col("close").alias("low"),
            "close",
            F.col("volume").cast(vol_type).alias("volume"),
        )

    def _sliding_ref(self, df):
        # the pre-r11 formulation: floor(sliding-20-frame sum / 20)
        w1 = Window.partitionBy("ticker").orderBy("date")
        rn = F.row_number().over(w1)
        ma = F.floor(
            F.when(
                rn >= 20,
                F.sum("volume").over(rolling_window(["ticker"], ["date"], 20)) / 20,
            )
        ).cast("long")
        return df.select(
            "ticker",
            "date",
            ma.alias("ref_ma"),
            F.when(ma.isNotNull(), F.col("volume") / ma).alias("ref_ratio"),
        )

    def test_cumsum_volma_exactly_matches_sliding_frame(self, spark):
        # Large, irregular volumes: any deviation in the trailing-sum value
        # (association, overflow handling, off-by-one frame) flips the
        # truncating floor or the double ratio.
        volumes = {
            "T": [(i * 7919 + 13) % 99991 * 4_000_003 + (i % 3) for i in range(60)],
            "U": [10**14 + i * 999_983 for i in range(25)],  # cumsum ~2.5e15
            "S": [5, 7, 11],  # shorter than the window: MA stays null
        }
        df = self._bars(spark, volumes)
        assert dict(df.dtypes)["volume"] == "bigint"
        out = compute_indicators(df, assume_non_null=True).join(
            self._sliding_ref(df), ["ticker", "date"]
        )
        rows = out.select("ticker", "date", "volume_ma_20", "ref_ma",
                          "volume_ratio", "ref_ratio").collect()
        assert len(rows) == sum(len(v) for v in volumes.values())
        assert sum(r.ref_ma is not None for r in rows) == (60 - 19) + (25 - 19)
        for r in rows:
            assert r.volume_ma_20 == r.ref_ma, r
            assert _bits(r.volume_ratio) == _bits(r.ref_ratio), r

    def test_fast_path_plans_exactly_two_window_passes(self, spark):
        # The fused structure: one pass for the O(1) running frames
        # (lag/ordinal/cumsum), one for the sliding sums + cumvol lag —
        # and the shared ordinal is evaluated once, not once per SMA mask.
        volumes = {"T": [1000 + i for i in range(30)]}
        df = self._bars(spark, volumes)
        plan = compute_indicators(df, assume_non_null=True)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window ") == 2, plan
        assert plan.count("row_number()") == 1, plan

    def test_double_volume_keeps_sliding_path_and_matches(self, spark):
        # Non-integral volume must NOT take the cumsum identity (float
        # reassociation) — the guard falls back to the sliding frame, whose
        # output still matches the reference formulation bitwise.
        volumes = {"T": [1e15 + ((i * 37) % 19) * 0.1 + i for i in range(40)]}
        df = self._bars(spark, volumes, vol_type="double")
        assert dict(df.dtypes)["volume"] == "double"
        plan = compute_indicators(df, assume_non_null=True)
        assert "__cumvol" not in plan.schema.simpleString()
        rows = plan.join(self._sliding_ref(df), ["ticker", "date"]).select(
            "volume_ma_20", "ref_ma", "volume_ratio", "ref_ratio"
        ).collect()
        assert sum(r.ref_ma is not None for r in rows) == 40 - 19
        for r in rows:
            assert r.volume_ma_20 == r.ref_ma, r
            assert _bits(r.volume_ratio) == _bits(r.ref_ratio), r


def _apply_splits_two_hof(stocks, splits):
    """The pre-r11 ``apply_splits`` formulation: broadcast per-ticker sorted
    split array, factor = aggregate(filter(arr, date < d), 1.0, acc*r) — the
    two-HOF reference the fused conditional aggregate must match bitwise."""
    per_ticker = F.broadcast(
        splits.select(
            "ticker",
            F.struct(
                F.col("execution_date").alias("d"),
                (F.col("split_from") / F.col("split_to")).cast("double").alias("r"),
            ).alias("__s"),
        )
        .groupBy("ticker")
        .agg(F.sort_array(F.collect_list("__s")).alias("__splits"))
    )
    joined = stocks.join(per_ticker, on="ticker", how="left")
    factor = F.when(
        F.col("__splits").isNotNull(),
        F.aggregate(
            F.filter("__splits", lambda s: F.col("date") < s["d"]),
            F.lit(1.0),
            lambda acc, s: acc * s["r"],
        ),
    ).otherwise(F.lit(1.0))
    return joined.withColumn("__total", factor).select(
        "ticker",
        "date",
        (F.col("open") * F.col("__total")).alias("open"),
        (F.col("high") * F.col("__total")).alias("high"),
        (F.col("low") * F.col("__total")).alias("low"),
        (F.col("close") * F.col("__total")).alias("close"),
        F.floor(F.col("volume") / F.col("__total")).cast("long").alias("volume"),
        F.floor(F.col("transactions") / F.col("__total")).cast("long").alias("transactions"),
    )


class TestFusedSplitFold:
    def test_fused_fold_bitwise_matches_two_hof_fold(self, spark):
        # Hostile fixture: non-representable ratios (1/3, 7/9), stacked
        # splits whose product depends on multiplication ORDER, bars exactly
        # ON an execution date (strict <), tickers with no splits (null
        # array branch), and a reverse split (ratio > 1).
        splits_rows = [
            ("A", "2023-03-15", 1, 3),   # r = 1/3 (inexact)
            ("A", "2023-07-01", 7, 9),   # r = 7/9 (inexact) — order matters
            ("A", "2023-11-20", 10, 1),  # reverse split, r = 10.0
            ("B", "2023-06-30", 2, 7),   # single inexact split
        ]
        splits = spark.createDataFrame(
            [(t, d, f, to) for t, d, f, to in splits_rows],
            "ticker string, ds string, split_from long, split_to long",
        ).select(
            "ticker",
            F.col("ds").cast("date").alias("execution_date"),
            "split_from",
            "split_to",
        )
        bars = spark.createDataFrame(
            [
                (t, f"2023-{m:02d}-{dd:02d}",
                 100.0 + m * 1.37 + dd / 7.0, 101.0 + m, 99.0 + m,
                 100.5 + m, 10_000 + m * 997 + dd, 100 + dd)
                for t in ("A", "B", "C")          # C has no splits
                for m in range(1, 13)
                for dd in (1, 15, 30) if not (m == 2 and dd == 30)
            ],
            "ticker string, ds string, open double, high double, low double,"
            " close double, volume long, transactions long",
        ).select("ticker", F.col("ds").cast("date").alias("date"),
                 "open", "high", "low", "close", "volume", "transactions")

        got = apply_splits(bars, splits).collect()
        ref = _apply_splits_two_hof(bars, splits).collect()
        key = lambda r: (r.ticker, r.date)
        got.sort(key=key)
        ref.sort(key=key)
        assert len(got) == len(ref) > 0
        # the fixture must actually exercise stacked adjustment: A's January
        # bars sit before all three of A's splits
        jan_a = [r for r in got if r.ticker == "A" and r.date.month == 1]
        assert jan_a and all(r.close != 101.5 for r in jan_a)  # factor != 1
        for rg, rr in zip(got, ref):
            dg, dr = rg.asDict(), rr.asDict()
            for k in dg:
                vg, vr = dg[k], dr[k]
                if isinstance(vg, float) or isinstance(vr, float):
                    assert _bits(vg) == _bits(vr), (k, rg, rr)
                else:
                    assert vg == vr, (k, rg, rr)

    def test_bar_on_execution_date_not_adjusted(self, spark):
        # Pins the strict < in the fused lambda: a bar ON the execution date
        # takes factor 1.0 from that split.
        splits = spark.createDataFrame(
            [("A", "2023-06-15", 1, 2)],
            "ticker string, ds string, split_from long, split_to long",
        ).select("ticker", F.col("ds").cast("date").alias("execution_date"),
                 "split_from", "split_to")
        bars = spark.createDataFrame(
            [("A", "2023-06-14", 10.0, 10.0, 10.0, 10.0, 100, 10),
             ("A", "2023-06-15", 10.0, 10.0, 10.0, 10.0, 100, 10)],
            "ticker string, ds string, open double, high double, low double,"
            " close double, volume long, transactions long",
        ).select("ticker", F.col("ds").cast("date").alias("date"),
                 "open", "high", "low", "close", "volume", "transactions")
        rows = {r.date.isoformat(): r for r in apply_splits(bars, splits).collect()}
        assert rows["2023-06-14"].close == 5.0   # adjusted by 1/2
        assert rows["2023-06-14"].volume == 200
        assert rows["2023-06-15"].close == 10.0  # NOT adjusted
        assert rows["2023-06-15"].volume == 100


class TestBruteForceTopkQueryDF:
    def test_df_query_bitwise_matches_list_query(self, spark, sf_dir):
        # r11: q45 passes the corpus-resident query as a 1-row DataFrame
        # (broadcast join, one Spark job) instead of a driver .first()
        # collect + literal-vector replan. The cosine fold is the same
        # zip_with/aggregate over the same doubles, so every score must be
        # IEEE-754 bitwise identical and the ranking unchanged.
        from tickerlake_spark.operators.similarity import brute_force_topk
        from tickerlake_spark.plans.catalog import load_table

        e = load_table(spark, sf_dir, "embeddings")
        qvec = [
            float(x)
            for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        ]
        q_df = e.filter(F.col("vec_id") == 0).select("embedding")
        a = brute_force_topk(e, qvec, k=50).collect()
        b = brute_force_topk(e, q_df, k=50).collect()
        assert len(a) == len(b) == 50
        for ra, rb in zip(a, b):
            assert ra.id == rb.id
            assert _bits(ra.cosine) == _bits(rb.cosine)

    def test_df_query_is_single_broadcast_join_plan(self, spark, sf_dir):
        # Plan gate: the DataFrame-query form folds the query row in as a
        # broadcast (no separate collect job is even possible — the plan is
        # one tree with a BroadcastExchange over the 1-row side).
        from tickerlake_spark.operators.similarity import brute_force_topk
        from tickerlake_spark.plans.catalog import load_table

        e = load_table(spark, sf_dir, "embeddings")
        q_df = e.filter(F.col("vec_id") == 0).select("embedding")
        plan = (
            brute_force_topk(e, q_df, k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
