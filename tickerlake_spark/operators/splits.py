"""Retroactive stock-split adjustment.

Re-expression of the reference's silver split logic
(reference: silver/splits.py:17-105) as one declarative Spark plan:

  stocks LEFT JOIN splits ON ticker        (row-multiplying, J1)
  factor = split_from/split_to  if date < execution_date else 1.0   (J2/P9)
  GROUP BY (ticker, date): product(factor), first(ohlcv)            (A2)
  prices x= total_factor; volume/transactions /= total_factor, truncated

Scale notes:
- splits is a ~1e3-row dimension -> broadcast join, no shuffle of the fact.
- the product aggregate uses exact sequential multiplication over the
  collected factor list (2-3 elements per group), NOT exp(sum(log)):
  the truncating volume division downstream flips on 1-ulp error, and
  split ratios are exactly representable so ordered multiplication is
  reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_splits"]

_OHLCV = ("open", "high", "low", "close", "volume", "transactions")


def apply_splits(
    stocks: DataFrame, splits: DataFrame, *, factor_once: bool = False
) -> DataFrame:
    """Adjust historical prices for later splits.

    For each (ticker, date) bar, every split with ``execution_date > date``
    contributes ``split_from / split_to``; the total adjustment is their
    product. Prices are multiplied by it; volume and transactions divided and
    truncated to long (the reference's UInt64 cast,
    reference: silver/splits.py:92-97).

    Plan: the splits dimension is pre-grouped into a per-ticker sorted array
    and BROADCAST; the factor is a map-side fold over that (tiny) array.
    The reference's formulation — row-multiplying left join then re-group
    with a product aggregate (silver/splits.py:60-84) — would shuffle the
    full fact table twice; this plan shuffles it ZERO times, which is the
    difference between a map job and a 100 TB shuffle at scale.

    Input contract: ``stocks`` holds one bar per (ticker, date) — the
    grouping the reference's re-aggregation implied is already the bar key.
    The fold multiplies in execution_date order (sorted array), exact for
    exactly-representable ratios.
    """
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
    # ONE conditional aggregate, not filter-then-aggregate (optimization r11,
    # guide §1.2 "per-task work"): the HOF pair is CodegenFallback
    # (interpreted per row), and filter() allocates an intermediate array per
    # evaluation — doubly costly because filter pushdown duplicates the fold
    # into downstream Filter conditions (q35's plan evaluates it 4x per row).
    # The fused walk multiplies the SAME kept elements in the SAME sorted
    # order (skipped elements return the accumulator unchanged), so the
    # product is bitwise-identical; measured -30% on the adjust pass, -32% on
    # q35 (tools/experiments/exp_fold_fused.py, full-row value_diffs=0).
    factor = F.when(
        F.col("__splits").isNotNull(),
        F.aggregate(
            "__splits",
            F.lit(1.0),
            lambda acc, s: F.when(F.col("date") < s["d"], acc * s["r"]).otherwise(acc),
        ),
    ).otherwise(F.lit(1.0))
    if factor_once:
        # Evaluate the fold ONCE per row no matter what sits above
        # (optimization r12, guide §4.4: stop the optimizer duplicating an
        # expensive expression). PushDownPredicates substitutes aliases into
        # filters it pushes through a Project — a consumer filter on the
        # adjusted close/volume (q35's vwap base filter) re-inlines the whole
        # interpreted fold into each pushed conjunct, 4 evaluations per row.
        # Wrapping the factor in a value-preserving non-deterministic
        # identity (functions.core.nondet_identity) marks the projection
        # non-deterministic, which pushdown refuses to cross; the filter
        # then reads the materialized __total attribute. Opt-in because the
        # barrier also blocks pushdown of UNRELATED predicates (e.g. date
        # pruning on incremental paths) — only consumers that filter on
        # adjusted columns should set it.
        from tickerlake_spark.functions.core import nondet_identity

        factor = nondet_identity(factor)
    adj = joined.withColumn("__total", factor).select(
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
    return adj
