"""Stream-stream joins: event attribution within a time bound.

The canonical shape: match each purchase to the view that preceded it by at
most ``max_delay``, per user — an inner interval join of two streams.

Correctness/state model (Structured Streaming):
- BOTH sides carry a watermark, and the join condition bounds event time in
  both directions (``view_ts <= purchase_ts <= view_ts + max_delay``). That
  pair of constraints is what lets Spark evict buffered rows: a view older
  than ``watermark + max_delay`` can never match a future purchase and is
  dropped from state.
- Without the time bound the state grows forever — this module refuses to
  build an unbounded join.

The same function works in batch mode (``withWatermark`` is a no-op on
batch DataFrames), which is how the parity test pins the semantics: run the
join as a real file-source stream and as a batch query, same input, same
output.

Scale: state is hash-partitioned by the join key (user), so per-task state
is bounded by (events per user within the watermark horizon) — independent
of total stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "attributed_purchases"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join left⋈right on ``key`` where ``right_ts`` falls within
    [left_ts, left_ts + max_delay]. Column names must be disjoint apart
    from ``key`` (alias before calling). Watermarks are applied to both
    sides; in batch mode they are ignored."""
    lk, rk = f"__l_{key}", f"__r_{key}"
    lw = left.withWatermark(left_ts, watermark).withColumnRenamed(key, lk)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(key, rk)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").withColumnRenamed(lk, key).drop(rk)


def attributed_purchases(
    events: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases attributed to a preceding view by the same user within
    ``max_delay``: (user_id, view_id, view_ts, purchase_id, purchase_ts,
    purchase_value). A purchase matching several views yields one row per
    qualifying view (attribution dedup is a downstream policy choice)."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return interval_join(
        views,
        purchases,
        key="user_id",
        left_ts="view_ts",
        right_ts="purchase_ts",
        max_delay=max_delay,
        watermark=watermark,
    ).select(
        "user_id",
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
