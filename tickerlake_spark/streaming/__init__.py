from tickerlake_spark.streaming.stateful import first_seen_filter, running_totals
from tickerlake_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_events",
    "running_totals",
    "first_seen_filter",
]
