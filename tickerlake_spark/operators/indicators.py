"""Technical indicators: SMA 20/50/200, ATR-14, volume MA + ratio.

Re-expression of the reference's per-ticker rolling indicators
(reference: silver/indicators.py:10-145). The reference sorts globally and
batches tickers for memory (silver/main.py:133-233); here each indicator is a
window over ``partitionBy(ticker) orderBy(date)`` — Spark hash-partitions
tickers across executors and spills per-partition, so the manual batching
disappears and the plan scales with cluster width.

Pinned semantics (SURVEY §4.3):
- rolling means are null until the window holds exactly n rows (Polars
  min_samples == window_size);
- volume_ma_20 is truncated to long BEFORE the ratio (the reference's
  UInt64 cast at silver/indicators.py:88);
- ATR's true range falls back to high-low on each ticker's first row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import rolling_mean_strict, true_range

__all__ = ["compute_indicators"]


def compute_indicators(daily: DataFrame) -> DataFrame:
    """ticker, date, sma_20, sma_50, sma_200, atr_14, volume_ma_20,
    volume_ratio — from daily bars (ticker, date, high, low, close, volume).
    """
    part, order = ["ticker"], ["date"]
    w1 = Window.partitionBy(*part).orderBy(*order)

    prev_close = F.lag("close", 1).over(w1)
    tr = true_range(F.col("high"), F.col("low"), prev_close)

    vol_ma = F.floor(
        rolling_mean_strict("volume", 20, part, order)
    ).cast("long")

    df = daily.withColumn("__tr", tr).withColumn("volume_ma_20", vol_ma)
    return df.select(
        "ticker",
        "date",
        rolling_mean_strict("close", 20, part, order).alias("sma_20"),
        rolling_mean_strict("close", 50, part, order).alias("sma_50"),
        rolling_mean_strict("close", 200, part, order).alias("sma_200"),
        rolling_mean_strict("__tr", 14, part, order).alias("atr_14"),
        "volume_ma_20",
        F.when(
            F.col("volume_ma_20").isNotNull(),
            F.col("volume") / F.col("volume_ma_20"),
        ).alias("volume_ratio"),
    )
