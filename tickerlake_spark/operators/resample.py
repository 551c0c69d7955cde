"""Time-bucketed OHLCV resampling (weekly / monthly bars).

Re-expression of the reference's group_by_dynamic resamples
(reference: silver/aggregates.py:10-93). Semantics pinned by SURVEY §4.3:

- weeks are Monday-anchored (the code's start_by="monday" beats the
  Sun-Sat docstring); months are calendar months;
- the bucket label is the period START date;
- open/close are the first/last row by date within the bucket — expressed
  with min_by/max_by over the date so no global sort is needed (the
  reference pre-sorts instead, an invariant that doesn't survive
  distribution).

One hash shuffle on (ticker, bucket); partial aggregation (map-side combine)
applies to all six aggregates, so this scales to 100 TB of daily bars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resample_ohlcv"]

_PERIODS = {"week": "week", "month": "month"}


def resample_ohlcv(daily: DataFrame, period: str) -> DataFrame:
    """Aggregate daily bars to ``period`` ('week' | 'month') bars.

    open=first, high=max, low=min, close=last, volume/transactions=sum.
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}, got {period!r}")
    bucket = F.date_trunc(_PERIODS[period], F.col("date")).cast("date")
    return (
        daily.groupBy("ticker", bucket.alias("__bucket"))
        .agg(
            F.min_by("open", "date").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "date").alias("close"),
            F.sum("volume").cast("long").alias("volume"),
            F.sum("transactions").cast("long").alias("transactions"),
        )
        .withColumnRenamed("__bucket", "date")
        .select("ticker", "date", "open", "high", "low", "close", "volume", "transactions")
    )
