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


def apply_splits(stocks: DataFrame, splits: DataFrame) -> DataFrame:
    """Adjust historical prices for later splits.

    For each (ticker, date), every split with ``execution_date > date``
    contributes ``split_from / split_to``; the total adjustment is their
    product. Prices are multiplied by it; volume and transactions divided and
    truncated to long (the reference's UInt64 cast,
    reference: silver/splits.py:92-97).
    """
    s = F.broadcast(
        splits.select("ticker", "execution_date", "split_from", "split_to")
    )
    joined = stocks.join(s, on="ticker", how="left")
    factor = (
        F.when(
            F.col("date") < F.col("execution_date"),
            F.col("split_from") / F.col("split_to"),
        )
        .otherwise(F.lit(1.0))
        .cast("double")
    )
    grouped = (
        joined.withColumn("__factor", factor)
        .groupBy("ticker", "date")
        .agg(
            # exact ordered product of the (few) factors; see module docstring
            F.aggregate(
                F.sort_array(F.collect_list("__factor")),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ).alias("__total"),
            *[F.first(c).alias(c) for c in _OHLCV],
        )
    )
    adj = grouped.select(
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
