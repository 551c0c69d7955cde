"""Focused equivalence tests for the round-12 operator-internal optimizations.

1. ``apply_splits(factor_once=True)`` wraps the split-factor fold in a
   non-deterministic identity (``WHEN monotonically_increasing_id() >= 0``,
   true for every row) so filter pushdown cannot re-inline the interpreted
   fold into consumer predicates (guide §4.4). The WHEN branch is taken for
   every row, so every adjusted value must be BITWISE identical to the
   default path — and a consumer filter on the adjusted columns must leave
   exactly ONE ``aggregate(__splits`` instance in the physical plan.

2. ``dedup._with_shingles`` wraps the shingle array in the same barrier:
   without it, PushDownPredicates substituted the tokenizer+shingler
   pipeline into the ``size(__shingles) > 0`` filter below the exchanges,
   where the transform lambda references the raw ``split()`` inline — the
   regex tokenizer re-ran per shingle per row (measured 3.77s → 0.60s for
   the shingle stage at sf0.1). The plan must evaluate the tokenizer
   exactly once per input branch.

3. ``dedup.band_keys`` emits the signature slice (array<long>) as the LSH
   band key instead of its dash-joined decimal string. Both encodings are
   injective, so the candidate pair set — and therefore the dedup output —
   must be identical.

4. ``compute_indicators(trailing_cumsum=True)`` computes the double
   trailing sums as cumulative-sum differences — three O(1)/row Window
   passes instead of the O(284)-adds-per-row sliding recompute. The
   identity reassociates float addition (measured max abs drift 4.2e-9 at
   sf0.1), so the RAW values are only approximately equal — but the
   DECLARED 6-decimal output must round identically (stable_round's nudge
   margin is 5e-9), and the integer volume columns must be exactly equal.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from tickerlake_spark.operators.splits import apply_splits


def _bits(x):
    return None if x is None else struct.pack("<d", x)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestFactorOnceBarrier:
    def _frames(self, spark):
        bars = spark.createDataFrame(
            [
                # A: stacked splits (two execution dates), incl. a bar whose
                # adjusted volume floors to 0 (volume < total factor) so the
                # consumer filter is exercised on both branches
                ("A", "1998-01-02", 10.0, 11.0, 9.0, 10.5, 3, 2),
                ("A", "1998-07-01", 20.0, 21.0, 19.0, 20.5, 1000, 9),
                ("A", "1999-09-02", 30.0, 31.0, 29.0, 30.5, 500, 4),
                # B: no splits row at all (NULL __splits branch)
                ("B", "1998-01-02", 5.0, 6.0, 4.0, 5.5, 77, 3),
            ],
            "ticker string, date string, open double, high double, "
            "low double, close double, volume long, transactions long",
        ).withColumn("date", F.col("date").cast("date"))
        splits = spark.createDataFrame(
            [
                ("A", "1998-06-15", 1.0, 2.0),
                ("A", "1999-09-01", 5.0, 1.0),
            ],
            "ticker string, execution_date string, split_from double, "
            "split_to double",
        ).withColumn("execution_date", F.col("execution_date").cast("date"))
        return bars, splits

    @staticmethod
    def _consumer_filter(adj):
        # the q35/vwap base filter shape — references ADJUSTED columns, which
        # is exactly what pushdown re-inlines the fold into
        return adj.filter(
            F.col("close").isNotNull()
            & F.col("volume").isNotNull()
            & (F.col("volume") > 0)
        )

    def test_values_bitwise_identical(self, spark):
        bars, splits = self._frames(spark)
        base = self._consumer_filter(apply_splits(bars, splits))
        once = self._consumer_filter(apply_splits(bars, splits, factor_once=True))
        key = lambda r: (r["ticker"], r["date"])  # noqa: E731
        a = sorted(base.collect(), key=key)
        b = sorted(once.collect(), key=key)
        assert len(a) == len(b) > 0
        for ra, rb in zip(a, b):
            for c in ("open", "high", "low", "close"):
                assert _bits(ra[c]) == _bits(rb[c]), (ra, rb, c)
            for c in ("ticker", "date", "volume", "transactions"):
                assert ra[c] == rb[c], (ra, rb, c)

    def test_consumer_filter_leaves_single_fold_instance(self, spark):
        bars, splits = self._frames(spark)
        once = self._consumer_filter(apply_splits(bars, splits, factor_once=True))
        assert _plan(once).count("aggregate(__splits") == 1

    def test_default_path_unchanged_plan_has_no_barrier(self, spark):
        # q31/q34 keep the default: no WHEN-mid wrapper in their plans
        bars, splits = self._frames(spark)
        base = apply_splits(bars, splits)
        assert "monotonically_increasing_id" not in _plan(base)
        # ...and the default still duplicates the fold under a consumer
        # filter (the documented reason the barrier exists); if a future
        # Spark stops duplicating, the barrier can be retired
        filtered = self._consumer_filter(base)
        assert _plan(filtered).count("aggregate(__splits") > 1


class TestShingleBarrier:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "alpha beta gamma delta zeta"),
                (3, "one two"),  # sub-n doc: empty shingles, filtered out
                (4, "the quick brown fox jumps over the lazy dog"),
            ],
            "doc_id long, text string",
        )

    def test_tokenizer_evaluated_once_in_plan(self, spark):
        from tickerlake_spark.operators.dedup import _with_shingles

        sh = _with_shingles(self._corpus(spark), "text", "doc_id", 3)
        plan = _plan(sh)
        # single input branch => the regex tokenizer must appear exactly
        # once; the pre-r12 plan re-inlined it into the pushed size filter
        assert plan.count("split(lower") == 1, plan
        rows = {r["doc_id"] for r in sh.collect()}
        assert rows == {1, 2, 4}

    def test_minhash_pairs_match_string_band_keys(self, spark):
        """Array band key produces the identical pair set as the historical
        dash-joined string key (both are injective encodings of the slice)."""
        from tickerlake_spark.operators.dedup import (
            _band_self_join,
            band_keys,
            minhash_lsh_pairs,
            signature_table,
        )

        corpus = self._corpus(spark).union(
            spark.createDataFrame(
                [(11, "alpha beta gamma delta epsilon x")],
                "doc_id long, text string",
            )
        )
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in minhash_lsh_pairs(
                corpus, "text", "doc_id", jaccard_threshold=0.2
            ).collect()
        }

        # reference: string-keyed banding over the same signatures
        sig = signature_table(corpus, "text", "doc_id")
        rows_per_band = 32 // 8
        str_banded = sig.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.array_join(
                            F.transform(
                                F.slice(
                                    F.col("signature"), b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda x: x.cast("string"),
                            ),
                            "-",
                        ).alias("key"),
                    ),
                )
            ).alias("__bk"),
        ).select("doc_id", "__bk.band", "__bk.key")
        cand_ref = {
            (r["id_a"], r["id_b"])
            for r in _band_self_join(str_banded, 0)
            .dropDuplicates(["id_a", "id_b"])
            .collect()
        }
        cand_got = {
            (r["id_a"], r["id_b"])
            for r in _band_self_join(
                band_keys(sig.select("doc_id", "signature")), 0
            )
            .dropDuplicates(["id_a", "id_b"])
            .collect()
        }
        assert cand_got == cand_ref
        assert {(a, b) for a, b, _ in got} <= cand_ref
        assert len(got) > 0


class TestTrailingCumsumIndicators:
    def _indicators(self, spark, **kw):
        from tickerlake_spark.operators.indicators import compute_indicators
        from tickerlake_spark.operators.splits import apply_splits
        from tickerlake_spark.plans.finance import stock_bars, stock_splits

        sf_dir = "/root/testdata/sf0.001"
        adj = apply_splits(
            stock_bars(spark, sf_dir, long_ticker=True),
            stock_splits(spark, sf_dir, long_ticker=True),
        )
        return compute_indicators(adj, **kw)

    def test_plans_exactly_three_window_passes(self, spark):
        ind = self._indicators(spark, assume_non_null=True, trailing_cumsum=True)
        plan = _plan(ind)
        n_windows = sum(
            1
            for line in plan.splitlines()
            if line.strip().lstrip("+-: ").startswith("Window ")
        )
        assert n_windows == 3, plan
        # every frame must be O(1)/row: no sliding ROWS BETWEEN n PRECEDING
        assert "PRECEDING AND CURRENT ROW" not in plan or (
            "unboundedpreceding" in plan.lower()
        )

    def test_rounded_output_matches_sliding(self, spark):
        from tickerlake_spark.functions.core import stable_round

        cur = self._indicators(spark, assume_non_null=True)
        new = self._indicators(spark, assume_non_null=True, trailing_cumsum=True)

        def decl(df):
            return df.select(
                "ticker",
                "date",
                *[
                    stable_round(F.col(c), 6).alias(c)
                    for c in ("sma_20", "sma_50", "sma_200", "atr_14")
                ],
                "volume_ma_20",
                stable_round(F.col("volume_ratio"), 6).alias("volume_ratio"),
            )

        a, b = decl(cur).alias("a"), decl(new).alias("b")
        cols = ["sma_20", "sma_50", "sma_200", "atr_14", "volume_ma_20", "volume_ratio"]
        mismatch = ~F.lit(True)
        for c in cols:
            mismatch = mismatch | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        diff = a.join(b, ["ticker", "date"], "full").filter(mismatch).count()
        assert diff == 0
        # integer volume columns must be EXACTLY equal (no rounding involved)
        vm = (
            cur.alias("a")
            .join(new.alias("b"), ["ticker", "date"])
            .filter(~F.col("a.volume_ma_20").eqNullSafe(F.col("b.volume_ma_20")))
            .count()
        )
        assert vm == 0

    def test_preconditions_enforced(self, spark):
        import pytest

        df = spark.createDataFrame(
            [("T", "2020-01-02", 1.0, 1.0, 1.0, 1.0, 2.5)],
            "ticker string, date string, open double, high double, low double,"
            " close double, volume double",
        ).withColumn("date", F.col("date").cast("date"))
        from tickerlake_spark.operators.indicators import compute_indicators

        with pytest.raises(ValueError):
            compute_indicators(df, assume_non_null=True, trailing_cumsum=True)
        with pytest.raises(ValueError):
            compute_indicators(df, assume_non_null=False, trailing_cumsum=True)
