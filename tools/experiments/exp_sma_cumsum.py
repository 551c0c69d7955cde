"""Measure: double-SMA/ATR as cumulative-sum difference — drift, rounded
flips vs the current sliding-frame formulation, and the speed on the table.

VERDICT r11 item 5: the O(w)-per-row sliding recompute (20+50+200+14 = 284
buffer adds per output row) is the remaining q34 inner-loop cost. The O(1)
identity `sum over [i-n+1, i] == cumsum[i] - cumsum[i-n]` is EXACT for
integers (landed r11 for volume) but reassociates float addition, so the
DOUBLE SMAs/ATR drift vs the sliding frame. This experiment quantifies the
decision the round notes must document:

1. max |relative drift| of the raw indicator values at sf0.1;
2. number of DECLARED-OUTPUT flips (after stable_round to 6 decimals) at
   sf0.001 / sf0.01 / sf0.1 — the driver's correctness gate compares the
   rounded repr hash, so ONE flip anywhere fails a query;
3. interleaved A/B of the q34 window pass, to size what the identity would
   buy if it were safe.

A Kahan-compensated running sum is not expressible in Spark's window
aggregates (sum over a frame is a plain double fold), so the cumsum path
is the only O(1) formulation available; if it flips, the honest outcome is
a documented rejection with these numbers attached.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round, true_range
from tickerlake_spark.operators.indicators import compute_indicators
from tickerlake_spark.operators.splits import apply_splits
from tickerlake_spark.plans.finance import stock_bars, stock_splits
from tickerlake_spark.session import get_spark


def compute_indicators_cumsum(daily: DataFrame) -> DataFrame:
    """assume_non_null fast path with ALL trailing sums as cumsum diffs.

    Pass 1: lag + ordinal + cumsum(close) + cumsum(volume);
    pass 2: cumsum(tr) (tr needs pass 1's lag);
    pass 3: the O(1) lag-n differences. Three WindowExec, all O(1)/row.
    """
    w1 = Window.partitionBy("ticker").orderBy("date")
    run = w1.rowsBetween(Window.unboundedPreceding, 0)
    df = daily.select(
        "*",
        F.lag("close", 1).over(w1).alias("__prev_close"),
        F.row_number().over(w1).alias("__rn"),
        F.sum("close").over(run).alias("__cc"),
        F.sum("volume").over(run).alias("__cumvol"),
    ).withColumn("__tr", true_range(F.col("high"), F.col("low"), F.col("__prev_close")))
    df = df.select("*", F.sum("__tr").over(run).alias("__ct"))
    rn = F.col("__rn")

    def trail(cum: str, n: int, zero):
        return F.col(cum) - F.coalesce(F.lag(cum, n).over(w1), F.lit(zero))

    def sma(n: int):
        return F.when(rn >= n, trail("__cc", n, 0.0) / n)

    vol_sum = trail("__cumvol", 20, F.lit(0).cast("long"))
    return df.select(
        "ticker",
        "date",
        "volume",
        sma(20).alias("sma_20"),
        sma(50).alias("sma_50"),
        sma(200).alias("sma_200"),
        F.when(rn >= 14, trail("__ct", 14, 0.0) / 14).alias("atr_14"),
        F.when(rn >= 20, F.floor(vol_sum / 20)).cast("long").alias("volume_ma_20"),
    ).select(
        "ticker",
        "date",
        "sma_20",
        "sma_50",
        "sma_200",
        "atr_14",
        "volume_ma_20",
        F.when(
            F.col("volume_ma_20").isNotNull(), F.col("volume") / F.col("volume_ma_20")
        ).alias("volume_ratio"),
    )


def declared(ind: DataFrame) -> DataFrame:
    return ind.select(
        F.col("ticker").cast("string").alias("ticker"),
        "date",
        stable_round(F.col("sma_20"), 6).alias("sma_20"),
        stable_round(F.col("sma_50"), 6).alias("sma_50"),
        stable_round(F.col("sma_200"), 6).alias("sma_200"),
        stable_round(F.col("atr_14"), 6).alias("atr_14"),
        "volume_ma_20",
        stable_round(F.col("volume_ratio"), 6).alias("volume_ratio"),
    )


def main() -> None:
    spark = get_spark(app_name="exp-sma-cumsum")
    spark.sparkContext.setLogLevel("ERROR")

    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        adj = apply_splits(
            stock_bars(spark, sf_dir, long_ticker=True),
            stock_splits(spark, sf_dir, long_ticker=True),
        )
        cur = compute_indicators(adj, assume_non_null=True)
        new = compute_indicators_cumsum(adj)

        # raw drift (sf0.1 only is enough, but cheap everywhere)
        j = cur.alias("a").join(new.alias("b"), ["ticker", "date"])
        drifts = j.select(
            *[
                F.max(
                    F.abs(F.col(f"a.{c}") - F.col(f"b.{c}"))
                    / F.greatest(F.abs(F.col(f"a.{c}")), F.lit(1e-300))
                ).alias(c)
                for c in ("sma_20", "sma_50", "sma_200", "atr_14")
            ]
        ).first()

        # declared-output flips after rounding
        da, db = declared(cur).alias("a"), declared(new).alias("b")
        cols = ["sma_20", "sma_50", "sma_200", "atr_14", "volume_ma_20", "volume_ratio"]
        mismatch = ~F.lit(True)
        for c in cols:
            mismatch = mismatch | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        flips = da.join(db, ["ticker", "date"], "full").filter(mismatch).count()
        n = cur.count()
        print(
            f"sf{sf}: rows={n} flips={flips} "
            f"max_rel_drift sma20={drifts['sma_20']:.2e} sma50={drifts['sma_50']:.2e} "
            f"sma200={drifts['sma_200']:.2e} atr={drifts['atr_14']:.2e}"
        )

    # speed on the table (sf0.1, interleaved, noop sink)
    sf_dir = "/root/testdata/sf0.1"
    adj = apply_splits(
        stock_bars(spark, sf_dir, long_ticker=True),
        stock_splits(spark, sf_dir, long_ticker=True),
    )

    def run(df: DataFrame) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {
        "sliding": lambda: compute_indicators(adj, assume_non_null=True),
        "cumsum": lambda: compute_indicators_cumsum(adj),
    }
    for f in variants.values():
        run(f())
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(8):
        for name, f in variants.items():
            times[name].append(run(f()))
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f}")


if __name__ == "__main__":
    main()
