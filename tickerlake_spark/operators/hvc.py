"""High-Volume-Close (HVC) analytics: event detection + stair-step mining.

The reference *declares* these as 12 gold tables (reference:
metadata.json:5-685) without shipping code; this module implements them from
the silver indicator/aggregate surface:

- ``hvc_events`` (D1): days where volume >= threshold x the 20-day volume MA
  ("3x+ 20-day average", metadata.json:11).
- ``stairstep_patterns`` (D2/D3): maximal runs of consecutive HVC days with
  strictly monotone closes — a gaps-and-islands sessionization: flag breaks
  with lag(), running-sum the breaks into island ids, aggregate per island.
- ``best_patterns`` (D4): each ticker's top pattern by step count.

Scale: everything is windows over partitionBy(ticker) + one groupBy on
(ticker, island) — two shuffles total, both on ticker-derived keys, no
driver-side iteration. collect_list per island is bounded by pattern length
(tens of rows), not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hvc_events", "stairstep_seq", "stairstep_patterns", "best_patterns"]


def hvc_events(indicators: DataFrame, daily: DataFrame, threshold: float = 3.0) -> DataFrame:
    """date, ticker, volume_avg_ratio, volume, volume_avg — rows where
    volume_ratio >= threshold (reference: metadata.json:9-67)."""
    ind = indicators.select("ticker", "date", "volume_ratio", "volume_ma_20")
    vol = daily.select("ticker", "date", "volume")
    return (
        ind.filter(F.col("volume_ratio") >= threshold)
        .join(vol, ["ticker", "date"])
        .select(
            "date",
            "ticker",
            F.col("volume_ratio").alias("volume_avg_ratio"),
            "volume",
            F.col("volume_ma_20").alias("volume_avg"),
        )
    )


def stairstep_seq(hvc: DataFrame, closes: DataFrame) -> DataFrame:
    """The (ticker, date, close) event sequence both stair-step directions
    window: events joined to their closes. Exposed so a caller computing
    BOTH directions can persist this once — the join shuffles the (large)
    closes side, and paying it per direction doubled the dominant cost of
    the full-rebuild stair-step stage at 10x."""
    return hvc.select("ticker", "date").join(closes, ["ticker", "date"])


def stairstep_patterns(
    hvc: DataFrame,
    closes: DataFrame,
    min_steps: int = 3,
    direction: str = "up",
    seq: DataFrame | None = None,
) -> DataFrame:
    """Maximal runs of consecutive HVC events with strictly rising
    (direction='up') or falling ('down') closes, per ticker.

    ``hvc``: (ticker, date) event rows; ``closes``: (ticker, date, close).
    Consecutive means adjacent in the ticker's HVC event sequence
    (reference: metadata.json:189-334 up / :457-576 down).
    ``seq``: optionally the precomputed (ideally persisted)
    ``stairstep_seq(hvc, closes)`` — both direction calls then share one
    events x closes join instead of shuffling the closes side twice.
    """
    if direction not in ("up", "down"):
        raise ValueError(f"direction must be 'up' or 'down', got {direction!r}")
    if seq is None:
        seq = stairstep_seq(hvc, closes)
    w = Window.partitionBy("ticker").orderBy("date")
    prev_close = F.lag("close").over(w)
    keeps = (
        F.col("close") > prev_close if direction == "up" else F.col("close") < prev_close
    )
    # break starts a new island; first row of each ticker is a break
    flagged = seq.withColumn(
        "__break", F.when(prev_close.isNull() | ~keeps, 1).otherwise(0)
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__break").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    pat = (
        islands.groupBy("ticker", "__island")
        .agg(
            F.min("date").alias("start_date"),
            F.max("date").alias("end_date"),
            F.count("*").cast("long").alias("hvc_count"),
            F.min_by("close", "date").alias("first_close"),
            F.max_by("close", "date").alias("last_close"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("date")),
                    lambda d: d.cast("string"),
                ),
            ).alias("dates_str"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("date", "close"))),
                    lambda s: s["close"].cast("string"),
                ),
            ).alias("closes_str"),
        )
        .filter(F.col("hvc_count") >= min_steps)
    )
    return pat.select(
        "ticker",
        "start_date",
        "end_date",
        "hvc_count",
        "first_close",
        "last_close",
        (
            (F.col("last_close") - F.col("first_close")) / F.col("first_close") * 100.0
        ).alias("gain_pct"),
        "dates_str",
        "closes_str",
    )


def best_patterns(patterns: DataFrame) -> DataFrame:
    """Per-ticker best stair-step pattern: most steps, earliest start as
    tie-break (reference: metadata.json:335-456)."""
    w = Window.partitionBy("ticker").orderBy(
        F.col("hvc_count").desc(), F.col("start_date").asc()
    )
    return (
        patterns.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
