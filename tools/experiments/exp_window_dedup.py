"""A/B: window-function duplication and pass-count fixes for q34/q35.

q35 (``vwap_signals``): the ytd/qtd vwap EXPRESSIONS are referenced three
times each in the output (value + two boolean flags), and Spark's
ExtractWindowExpressions does NOT dedup identical window functions — the
shipped plan's two Window nodes carry 12 running sums where 4 suffice.
Fix: materialize the four cumulative sums as columns once, then derive all
outputs from the columns (same functions, same per-row arithmetic =>
identical values).

q34 (``compute_indicators``): three Window passes where two suffice, plus
five redundant O(1) running frames — four separate row_number() instances
in the final pass (one per SMA mask), one more in the middle pass, and
lag(close) evaluated twice. Fix: compute lag/ordinal/cumsum once in pass 1,
fuse the cumvol-lag into the sliding-sum pass (same window spec => one
WindowExec), mask on the materialized ordinal column.

Both variants are value-identical by construction (same window functions
over the same spec, combined by the same scalar arithmetic) — verified by
full-row compare below.
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

from tickerlake_spark.functions.core import rolling_window, true_range
from tickerlake_spark.operators.indicators import compute_indicators
from tickerlake_spark.operators.splits import apply_splits
from tickerlake_spark.operators.vwap import vwap_signals
from tickerlake_spark.plans.finance import stock_bars, stock_splits
from tickerlake_spark.session import get_spark


def vwap_signals_dedup(daily: DataFrame) -> DataFrame:
    import datetime as dt

    calculated_at = dt.datetime(2026, 1, 1, 0, 0, 0)
    base = (
        daily.filter(
            F.col("close").isNotNull()
            & F.col("volume").isNotNull()
            & (F.col("volume") > 0)
        )
        .select(
            "ticker",
            "date",
            "close",
            "volume",
            F.year("date").alias("__year"),
            F.quarter("date").alias("__quarter"),
            (F.col("close") * F.col("volume")).alias("__pv"),
        )
    )
    w_ytd = (
        Window.partitionBy("ticker", "__year")
        .orderBy("__quarter", "date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_qtd = (
        Window.partitionBy("ticker", "__year", "__quarter")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    aug = base.select(
        "ticker",
        "date",
        "close",
        F.sum("__pv").over(w_ytd).alias("__ytd_pv"),
        F.sum("volume").over(w_ytd).alias("__ytd_vol"),
        F.sum("__pv").over(w_qtd).alias("__qtd_pv"),
        F.sum("volume").over(w_qtd).alias("__qtd_vol"),
    )
    ytd_vwap = F.col("__ytd_pv") / F.col("__ytd_vol")
    qtd_vwap = F.col("__qtd_pv") / F.col("__qtd_vol")
    return aug.select(
        "ticker",
        "date",
        "close",
        ytd_vwap.alias("ytd_vwap"),
        qtd_vwap.alias("qtd_vwap"),
        (F.col("close") > ytd_vwap).alias("above_ytd_vwap"),
        (F.col("close") > qtd_vwap).alias("above_qtd_vwap"),
        ((F.col("close") > ytd_vwap) & (F.col("close") > qtd_vwap)).alias(
            "above_both"
        ),
        F.lit(calculated_at).cast("timestamp").alias("calculated_at"),
    )


def compute_indicators_fused(daily: DataFrame) -> DataFrame:
    """assume_non_null=True variant: 2 window passes, single ordinal/lag."""
    part, order = ["ticker"], ["date"]
    w1 = Window.partitionBy(*part).orderBy(*order)
    w_cum = w1.rowsBetween(Window.unboundedPreceding, 0)

    volume_is_integral = dict(daily.dtypes).get("volume") in (
        "bigint", "int", "smallint", "tinyint"
    )
    # Pass 1: every O(1) running frame at once — lag, ordinal, cumsum.
    pass1 = [
        F.lag("close", 1).over(w1).alias("__prev_close"),
        F.row_number().over(w1).alias("__rn"),
    ]
    if volume_is_integral:
        pass1.append(F.sum("volume").over(w_cum).alias("__cumvol"))
    df = daily.select("*", *pass1).withColumn(
        "__tr",
        true_range(F.col("high"), F.col("low"), F.col("__prev_close")),
    )

    rn = F.col("__rn")

    def mean_full(col: str, n: int):
        return F.when(rn >= n, F.sum(col).over(rolling_window(part, order, n)) / n)

    if volume_is_integral:
        vol_sum_20 = F.col("__cumvol") - F.coalesce(
            F.lag("__cumvol", 20).over(w1), F.lit(0).cast("long")
        )
        vol_ma = F.when(rn >= 20, F.floor(vol_sum_20 / 20)).cast("long")
    else:
        vol_ma = F.floor(mean_full("volume", 20)).cast("long")

    # Pass 2: the sliding sums AND the cumvol lag — one spec, one WindowExec.
    df = df.select(
        "ticker",
        "date",
        "volume",
        mean_full("close", 20).alias("sma_20"),
        mean_full("close", 50).alias("sma_50"),
        mean_full("close", 200).alias("sma_200"),
        mean_full("__tr", 14).alias("atr_14"),
        vol_ma.alias("volume_ma_20"),
    )
    return df.select(
        "ticker",
        "date",
        "sma_20",
        "sma_50",
        "sma_200",
        "atr_14",
        "volume_ma_20",
        F.when(
            F.col("volume_ma_20").isNotNull(),
            F.col("volume") / F.col("volume_ma_20"),
        ).alias("volume_ratio"),
    )


def _compare(a: DataFrame, b: DataFrame, keys: list[str]) -> int:
    cols = [c for c in a.columns if c not in keys]
    aa, bb = a.alias("a"), b.alias("b")
    mismatch = ~F.lit(True)
    for c in cols:
        mismatch = mismatch | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    return aa.join(bb, keys, "full").filter(mismatch).count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-window-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    bars = stock_bars(spark, sf_dir, long_ticker=True)
    splits = stock_splits(spark, sf_dir, long_ticker=True)
    adjusted = apply_splits(bars, splits)

    import datetime as dt

    cur_vwap = vwap_signals(adjusted, dt.datetime(2026, 1, 1))
    new_vwap = vwap_signals_dedup(adjusted)
    d1 = _compare(cur_vwap, new_vwap, ["ticker", "date"])
    print(f"vwap value_diffs={d1}")

    cur_ind = compute_indicators(adjusted, assume_non_null=True)
    new_ind = compute_indicators_fused(adjusted)
    d2 = _compare(cur_ind, new_ind, ["ticker", "date"])
    print(f"indicators value_diffs={d2}")
    assert d1 == 0 and d2 == 0

    def run(df: DataFrame) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {
        "vwap_cur": lambda: vwap_signals(adjusted, dt.datetime(2026, 1, 1)),
        "vwap_new": lambda: vwap_signals_dedup(adjusted),
        "ind_cur": lambda: compute_indicators(adjusted, assume_non_null=True),
        "ind_new": lambda: compute_indicators_fused(adjusted),
    }
    for name, f in variants.items():
        run(f())
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(5):
        for name, f in variants.items():
            times[name].append(run(f()))
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f}")


if __name__ == "__main__":
    main()
