"""A/B: two-HOF split-factor fold (filter + aggregate) vs ONE conditional
aggregate, plus a longer-rep re-read of the indicator pass fusion.

``aggregate(filter(arr, date < d), 1.0, acc*r)`` allocates an intermediate
filtered array per evaluation and walks the array twice; the fused
``aggregate(arr, 1.0, (acc, s) -> IF(date < s.d, acc * s.r, acc))`` is one
interpreted walk, no intermediate allocation. The multiplication sequence
over the KEPT elements is identical (skipped elements contribute the
accumulator unchanged), so the product is bitwise-identical. q35's plan
evaluates the fold 4x per row (filter pushdown duplication), q31/q34 1x —
the fused fold cuts every evaluation's cost without changing plan shape.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickerlake_spark.operators.splits import apply_splits
from tickerlake_spark.operators.vwap import vwap_signals
from tickerlake_spark.plans.finance import stock_bars, stock_splits
from tickerlake_spark.session import get_spark

_OHLCV = ("open", "high", "low", "close")


def apply_splits_fused(stocks: DataFrame, splits: DataFrame) -> DataFrame:
    per_ticker = F.broadcast(
        splits.select(
            "ticker",
            F.struct(
                F.col("execution_date").alias("d"),
                (F.col("split_from") / F.col("split_to"))
                .cast("double")
                .alias("r"),
            ).alias("__s"),
        )
        .groupBy("ticker")
        .agg(F.sort_array(F.collect_list("__s")).alias("__splits"))
    )
    joined = stocks.join(per_ticker, on="ticker", how="left")
    factor = F.when(
        F.col("__splits").isNotNull(),
        F.aggregate(
            "__splits",
            F.lit(1.0),
            lambda acc, s: F.when(F.col("date") < s["d"], acc * s["r"]).otherwise(acc),
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
        F.floor(F.col("transactions") / F.col("__total"))
        .cast("long")
        .alias("transactions"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-fold-fused")
    spark.sparkContext.setLogLevel("ERROR")

    bars = stock_bars(spark, sf_dir, long_ticker=True)
    splits = stock_splits(spark, sf_dir, long_ticker=True)

    cur = apply_splits(bars, splits)
    new = apply_splits_fused(bars, splits)

    data_cols = list(_OHLCV) + ["volume", "transactions"]
    a, b = cur.alias("a"), new.alias("b")
    mismatch = ~F.lit(True)
    for c in data_cols:
        mismatch = mismatch | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    diff = a.join(b, ["ticker", "date"], "full").filter(mismatch).count()
    print(f"value_diffs={diff}")
    assert diff == 0

    from tools.experiments.exp_window_dedup import compute_indicators_fused
    from tickerlake_spark.operators.indicators import compute_indicators

    import datetime as dt

    def run(df: DataFrame) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {
        "adj_2hof": lambda: apply_splits(bars, splits),
        "adj_fused": lambda: apply_splits_fused(bars, splits),
        "q35_2hof": lambda: vwap_signals(apply_splits(bars, splits), dt.datetime(2026, 1, 1)),
        "q35_fused": lambda: vwap_signals(apply_splits_fused(bars, splits), dt.datetime(2026, 1, 1)),
        "ind_cur": lambda: compute_indicators(apply_splits(bars, splits), assume_non_null=True),
        "ind_fusedwin": lambda: compute_indicators_fused(apply_splits(bars, splits)),
    }
    for name, f in variants.items():
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
