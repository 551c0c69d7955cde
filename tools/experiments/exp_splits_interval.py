"""A/B: per-row HOF split-factor fold vs per-ticker interval broadcast join.

The shipped ``apply_splits`` broadcasts a per-ticker sorted array of
(execution_date, ratio) structs and computes each bar's factor with
``aggregate(filter(__splits, date < d), 1.0, acc*r)`` — a higher-order
function, which is CodegenFallback: every evaluation is interpreted and
allocates an intermediate array PER BAR ROW. Worse, consumers that filter on
adjusted columns (q35's valid-bar filter) get the fold duplicated by filter
pushdown: the q35 plan evaluates it 4x per row (3x in the Filter + 1x in the
Project).

The interval variant precomputes, per ticker, the k+1 half-open date
intervals with their (left-associated, bitwise-identical) suffix-product
factors — ON THE TINY DIMENSION — and broadcast-joins bars to exactly one
interval row. The per-bar work becomes a hash probe + <=3 codegen'd date
compares; the factor is a plain double column, so downstream filter
duplication costs a multiply, not an interpreted fold.

Equivalence: for a bar at date t with sorted splits s_1..s_k, the shipped
fold multiplies r_j for the suffix j >= m (m = first j with d_j > t),
left-to-right from 1.0. The interval factor for [d_{m-1}, d_m) is
aggregate(slice(__splits, m, k-m+1), 1.0, acc*r) — same elements, same
order, same fold => bitwise-identical doubles. Verified below by a full
bit-compare over every sf0.1 row.
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
from tickerlake_spark.plans.finance import stock_bars, stock_splits
from tickerlake_spark.session import get_spark

_OHLCV = ("open", "high", "low", "close")


def split_intervals(splits: DataFrame) -> DataFrame:
    """ticker, __lo, __hi, __total: the k+1 half-open adjustment intervals
    per ticker (null lo/hi = unbounded), factor = left-assoc suffix product
    of ratios — computed once on the dimension, not per bar."""
    per_ticker = splits.select(
        "ticker",
        F.struct(
            F.col("execution_date").alias("d"),
            (F.col("split_from") / F.col("split_to")).cast("double").alias("r"),
        ).alias("__s"),
    ).groupBy("ticker").agg(F.sort_array(F.collect_list("__s")).alias("__splits"))
    k = F.size("__splits")
    iv = F.explode(
        F.transform(
            F.sequence(F.lit(0), k),
            lambda i: F.struct(
                F.when(i > 0, F.element_at("__splits", i)["d"]).alias("lo"),
                F.when(i < k, F.element_at("__splits", i + 1)["d"]).alias("hi"),
                F.aggregate(
                    F.slice("__splits", i + 1, k - i),
                    F.lit(1.0),
                    lambda acc, s: acc * s["r"],
                ).alias("r"),
            ),
        )
    )
    return per_ticker.select("ticker", iv.alias("__iv")).select(
        "ticker",
        F.col("__iv.lo").alias("__lo"),
        F.col("__iv.hi").alias("__hi"),
        F.col("__iv.r").alias("__total"),
    )


def apply_splits_interval(stocks: DataFrame, splits: DataFrame) -> DataFrame:
    iv = F.broadcast(split_intervals(splits)).alias("iv")
    st = stocks.alias("st")
    cond = (
        (F.col("st.ticker") == F.col("iv.ticker"))
        & (F.col("iv.__lo").isNull() | (F.col("st.date") >= F.col("iv.__lo")))
        & (F.col("iv.__hi").isNull() | (F.col("st.date") < F.col("iv.__hi")))
    )
    joined = st.join(iv, cond, "left")
    total = F.coalesce(F.col("iv.__total"), F.lit(1.0))
    return joined.select(
        F.col("st.ticker").alias("ticker"),
        F.col("st.date").alias("date"),
        (F.col("st.open") * total).alias("open"),
        (F.col("st.high") * total).alias("high"),
        (F.col("st.low") * total).alias("low"),
        (F.col("st.close") * total).alias("close"),
        F.floor(F.col("st.volume") / total).cast("long").alias("volume"),
        F.floor(F.col("st.transactions") / total).cast("long").alias("transactions"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-splits-interval")
    spark.sparkContext.setLogLevel("ERROR")

    bars = stock_bars(spark, sf_dir, long_ticker=True)
    splits = stock_splits(spark, sf_dir, long_ticker=True)

    cur = apply_splits(bars, splits)
    new = apply_splits_interval(bars, splits)

    # --- exact-compare every row/column (value equality on all 8 cols;
    # factors are positive so no -0.0/NaN bit subtleties) ------------------
    n_cur = cur.count()
    data_cols = list(_OHLCV) + ["volume", "transactions"]
    a, b = cur.alias("a"), new.alias("b")
    mismatch = ~F.lit(True)
    for c in data_cols:
        mismatch = mismatch | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    diff = (
        a.join(b, ["ticker", "date"], "full")
        .filter(mismatch)
        .count()
    )
    print(f"rows={n_cur} value_diffs={diff}")
    assert diff == 0, "interval variant is NOT value-identical"

    # --- interleaved timing (q35-shaped consumer: filter + project) ------
    from tickerlake_spark.operators.vwap import vwap_signals

    def run(df: DataFrame) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {
        "hof_adj": lambda: apply_splits(bars, splits),
        "ivl_adj": lambda: apply_splits_interval(bars, splits),
        "hof_q35": lambda: vwap_signals(apply_splits(bars, splits)),
        "ivl_q35": lambda: vwap_signals(apply_splits_interval(bars, splits)),
    }
    for name, f in variants.items():  # warmup (codegen)
        run(f())
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(5):  # interleaved to cancel box drift
        for name, f in variants.items():
            times[name].append(run(f()))
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f}")


if __name__ == "__main__":
    main()
