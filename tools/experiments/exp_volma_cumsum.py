"""A/B: volume MA-20 as sliding-frame sum vs cumulative-sum difference.

volume is a LONG, so ``sum over rowsBetween(-19, 0)`` equals
``cumsum - lag(cumsum, 20)`` EXACTLY (integer arithmetic has no
reassociation error) — unlike the double SMAs, where the cumsum-difference
changes float association and was rejected (OPTIMIZATION_r11.md, Not yet
optimized). The sliding frame recomputes its buffer from scratch per output
row (O(20) adds); the unbounded-preceding cumsum frame is incremental O(1),
and lag is O(1).

Measures the full q34-shaped indicator pass (noop sink, warmup + min of 3)
with the shipped operator vs the cumsum variant, then bit-compares the
volume_ma_20 / volume_ratio columns on the same input.
"""

from __future__ import annotations

import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import rolling_window, true_range
from tickerlake_spark.operators.indicators import compute_indicators
from tickerlake_spark.operators.splits import apply_splits
from tickerlake_spark.plans.finance import stock_bars, stock_splits
from tickerlake_spark.session import get_spark
from tools.bench_e2e import host_conditions


def indicators_cumsum_volma(daily: DataFrame) -> DataFrame:
    """compute_indicators(assume_non_null=True) with the volume MA via
    cumulative-sum difference instead of a 20-row sliding frame."""
    part, order = ["ticker"], ["date"]
    w1 = Window.partitionBy(*part).orderBy(*order)
    w_cum = w1.rowsBetween(Window.unboundedPreceding, 0)

    rn = F.row_number().over(w1)
    prev_close = F.lag("close", 1).over(w1)
    tr = true_range(F.col("high"), F.col("low"), prev_close)

    def mean_full(col: str, n: int):
        return F.when(rn >= n, F.sum(col).over(rolling_window(part, order, n)) / n)

    # Materialize the cumsum first: Spark rejects nested window expressions,
    # and as a column it lands in the SAME WindowExec pass as lag/true-range
    # (identical partition+order spec), so the pass count stays 2.
    df = daily.withColumn("__tr", tr).withColumn(
        "__cumvol", F.sum("volume").over(w_cum)
    )
    vol_sum_20 = F.col("__cumvol") - F.coalesce(
        F.lag("__cumvol", 20).over(w1), F.lit(0).cast("long")
    )
    vol_ma = F.when(rn >= 20, F.floor(vol_sum_20 / 20)).cast("long")

    df = df.withColumn("volume_ma_20", vol_ma)
    return df.select(
        "ticker",
        "date",
        mean_full("close", 20).alias("sma_20"),
        mean_full("close", 50).alias("sma_50"),
        mean_full("close", 200).alias("sma_200"),
        mean_full("__tr", 14).alias("atr_14"),
        "volume_ma_20",
        F.when(
            F.col("volume_ma_20").isNotNull(),
            F.col("volume") / F.col("volume_ma_20"),
        ).alias("volume_ratio"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-volma-cumsum", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    print("host:", host_conditions("/tmp"), flush=True)

    def adjusted():
        return apply_splits(
            stock_bars(spark, sf_dir, long_ticker=True),
            stock_splits(spark, sf_dir, long_ticker=True),
        )

    variants = {
        "sliding (shipped)": lambda: compute_indicators(adjusted(), assume_non_null=True),
        "cumsum volma": lambda: indicators_cumsum_volma(adjusted()),
    }
    for name, fn in variants.items():
        fn().write.format("noop").mode("overwrite").save()  # warmup
        ts = []
        for _ in range(3):
            df = fn()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: min {min(ts):.4f}  runs {[round(t, 4) for t in ts]}", flush=True)

    # bit-exact comparison of the changed columns
    bits = lambda x: None if x is None else struct.pack("<d", x)
    a = {
        (r.ticker, r.date): r
        for r in compute_indicators(adjusted(), assume_non_null=True)
        .select("ticker", "date", "volume_ma_20", "volume_ratio")
        .collect()
    }
    b = {
        (r.ticker, r.date): r
        for r in indicators_cumsum_volma(adjusted())
        .select("ticker", "date", "volume_ma_20", "volume_ratio")
        .collect()
    }
    assert a.keys() == b.keys()
    diff = 0
    for k, ra in a.items():
        rb = b[k]
        if ra.volume_ma_20 != rb.volume_ma_20 or bits(ra.volume_ratio) != bits(rb.volume_ratio):
            diff += 1
            if diff < 5:
                print("DIFF", k, ra, rb)
    print(f"compared {len(a)} rows, {diff} diffs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
