"""A/B: q35's split-factor fold evaluated 4x per row (filter-pushdown
re-inlining) vs ONCE behind a non-deterministic identity barrier.

VERDICT r11 item 1: `plans/r11/q35_vwap_signals_after.txt` contains FOUR
`aggregate(__splits, 1.0, ...)` instances — the vwap base filter
(close IS NOT NULL AND volume IS NOT NULL AND volume > 0) references the
adjusted columns, and PushDownPredicates substitutes the alias into each
conjunct it pushes through the __total projection. Guide §4.4's technique
(stop the optimizer duplicating an expensive expression) applied to a
CodegenFallback HOF instead of a UDF: wrap the factor in
`WHEN monotonically_increasing_id() >= 0 THEN factor` — always true (both
halves of the id are non-negative), value untouched, but the projection
becomes non-deterministic so pushdown cannot cross it and the filter reads
the materialized __total attribute. (rand()-based guards do not survive:
Spark 4 simplifies always-true rand comparisons before pushdown runs.)

Checks:
1. plan: the factor_once variant contains exactly ONE `aggregate(__splits`
   instance (the current one contains 4);
2. value: full-row null-safe equality over every q35 output column at the
   given SF (the wrapper's WHEN branch is taken for every row, so values
   are bitwise identical);
3. schema: identical column names/types (nullability of the adjusted
   columns was already true — bars come out of nullable aggregates);
4. interleaved same-process A/B (alternating reps after shared warmup) on
   the q35 noop sink.
"""

from __future__ import annotations

import datetime as dt
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

_CALC = dt.datetime(2026, 1, 1)


def q35_of(adj: DataFrame) -> DataFrame:
    from tickerlake_spark.functions.core import stable_round

    sig = vwap_signals(adj, calculated_at=_CALC)
    return sig.select(
        F.col("ticker").cast("string").alias("ticker"),
        "date",
        stable_round(F.col("close"), 6).alias("close"),
        stable_round(F.col("ytd_vwap"), 2).alias("ytd_vwap"),
        stable_round(F.col("qtd_vwap"), 2).alias("qtd_vwap"),
        "above_ytd_vwap",
        "above_qtd_vwap",
        "above_both",
        "calculated_at",
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-q35-fold-once")
    spark.sparkContext.setLogLevel("ERROR")

    bars = stock_bars(spark, sf_dir, long_ticker=True)
    splits = stock_splits(spark, sf_dir, long_ticker=True)

    cur = q35_of(apply_splits(bars, splits))
    new = q35_of(apply_splits(bars, splits, factor_once=True))

    # 1. plan instance count
    def folds(df: DataFrame) -> int:
        return df._jdf.queryExecution().executedPlan().toString().count(
            "aggregate(__splits"
        )

    n_cur, n_new = folds(cur), folds(new)
    print(f"fold_instances: current={n_cur} factor_once={n_new}")
    assert n_new == 1, f"expected exactly 1 fold instance, got {n_new}"

    # 3. schema parity (names + types; nullability printed for the record)
    assert [(f.name, f.dataType) for f in cur.schema.fields] == [
        (f.name, f.dataType) for f in new.schema.fields
    ], "schema mismatch"
    print(f"schema: {[ (f.name, f.nullable) for f in new.schema.fields ]}")

    # 2. full-row null-safe value equality
    cols = [c for c in cur.columns if c not in ("ticker", "date")]
    a, b = cur.alias("a"), new.alias("b")
    mismatch = ~F.lit(True)
    for c in cols:
        mismatch = mismatch | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    diff = a.join(b, ["ticker", "date"], "full").filter(mismatch).count()
    rows_a, rows_b = cur.count(), new.count()
    print(f"value_diffs={diff} rows a={rows_a} b={rows_b}")
    assert diff == 0 and rows_a == rows_b

    # 4. interleaved A/B
    def run(df: DataFrame) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {
        "q35_4x": lambda: q35_of(apply_splits(bars, splits)),
        "q35_1x": lambda: q35_of(apply_splits(bars, splits, factor_once=True)),
    }
    for f in variants.values():
        run(f())
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(10):
        for name, f in variants.items():
            times[name].append(run(f()))
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f}")


if __name__ == "__main__":
    main()
