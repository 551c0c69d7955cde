"""Structured Streaming tests: file-source micro-batches must produce the
same results as batch execution of the same window operator (the operators
are literally the same functions)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tickerlake_spark.streaming.windows import stream_events, tumbling_agg


@pytest.fixture()
def event_drops(spark, sf_dir, tmp_path):
    """Split sf0.001 events into two parquet 'drops' landing in a dir."""
    src = os.path.join(sf_dir, "events.parquet")
    from tickerlake_spark.plans.catalog import load_table

    events = load_table(spark, os.path.dirname(src) or sf_dir, "events")
    # event-time watermarks require TimestampType (not ntz); session TZ is
    # UTC so the cast is value-preserving
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    drop_dir = str(tmp_path / "landing")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(drop_dir)
    second.coalesce(1).write.mode("append").parquet(drop_dir)
    return drop_dir, events


def test_streaming_tumbling_matches_batch(spark, event_drops, tmp_path):
    drop_dir, events = event_drops
    schema = events.schema

    stream = stream_events(spark, drop_dir, schema, max_files_per_trigger=1)
    assert stream.isStreaming
    agg = tumbling_agg(stream, "1 hour", watermark="2 hours")

    query = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        streamed = spark.sql(
            "SELECT * FROM tumbling_test ORDER BY window_start, event_type"
        ).collect()
    finally:
        query.stop()

    batch = (
        tumbling_agg(events, "1 hour")
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert len(streamed) == len(batch) > 0
    for s, b in zip(streamed, batch):
        assert s.window_start == b.window_start
        assert s.n_events == b.n_events
        assert abs(s.total_value - b.total_value) < 1e-6


def test_streaming_dedup_with_watermark(spark, event_drops, tmp_path):
    """Streaming exact-dedup on event_id: duplicate drops collapse."""
    drop_dir, events = event_drops
    schema = events.schema
    stream = stream_events(spark, drop_dir, schema, max_files_per_trigger=1)
    deduped = stream.withWatermark("ts", "1 day").dropDuplicates(["event_id"])
    query = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        query.processAllAvailable()
        n = spark.sql("SELECT count(*) AS n FROM dedup_test").first().n
    finally:
        query.stop()
    assert n == events.count()  # drops were disjoint halves -> no loss, no dup
