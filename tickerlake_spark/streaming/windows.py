"""Event-time windows: tumbling, sliding, session — batch AND streaming.

The reference has no streaming runtime (its incremental pattern is
checkpoint + watermark filters, SURVEY §2.10); this module is the
Structured-Streaming-shaped extension over the ``events`` stream table.

Design: each window aggregation is ONE function used by both execution
modes — ``F.window`` / ``F.session_window`` work identically in batch
groupBy and in streaming groupBy. Batch mode is what the DuckDB oracle
checks; streaming mode adds ``withWatermark`` for state eviction and is
covered by batch-parity tests (same input -> same output).

Scale: streaming state is keyed by (window, key); the watermark bounds
state size to (watermark horizon / slide) windows per key. Session windows
use Spark's built-in session merge — state per active session only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "stream_events"]


def _window_agg(grouped, value_col: str) -> DataFrame:
    return grouped.agg(
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("total_value"),
    )


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key tumbling-window counts/sums. Pass ``watermark`` (e.g.
    '2 hours') when ``events`` is a streaming DataFrame."""
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    g = events.groupBy(F.window(ts_col, duration).alias("w"), F.col(key_col))
    return _window_agg(g, value_col).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "n_events",
        "total_value",
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key sliding-window counts/sums (each event lands in
    duration/slide windows)."""
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    g = events.groupBy(F.window(ts_col, duration, slide).alias("w"), F.col(key_col))
    return _window_agg(g, value_col).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "n_events",
        "total_value",
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows (merge events closer than ``gap``): session
    bounds, event count, value sum. Streaming mode REQUIRES a watermark
    (session state must be evictable)."""
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    g = events.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
    return _window_agg(g, value_col).select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        key_col,
        "n_events",
        "total_value",
    )


def stream_events(
    spark,
    source_dir: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source streaming reader over a directory of parquet drops —
    the standard pattern for a landing zone fed by an external writer."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
