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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["running_totals", "first_seen_filter", "session_tracker"]


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
        # A key's batch may arrive as multiple Arrow chunks; take the min
        # across ALL of them, not just the first non-empty chunk.
        chunk_mins = [pdf[ts_col].min() for pdf in pdfs if len(pdf)]
        first_ts = str(min(chunk_mins)) if chunk_mins else None
        state.update((1,))
        yield pd.DataFrame({key_col: [str(key[0])], "first_ts": [first_ts]})

    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def session_tracker(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark-correct streaming sessionization (custom stateful op).

    Buffers each user's event times in state, splits them into sessions by
    ``gap``, and emits a session only once the event-time watermark has
    passed ``session_end + gap`` — i.e. once no late event can extend or
    bridge it. This handles out-of-order arrival that an eager gap-closer
    would mis-sessionize; it is the applyInPandasWithState analog of the
    built-in ``session_window`` (q62) with full control over the emitted
    shape, and the stateful generalization of the batch gaps-and-islands
    plan (q83).

    State per user is the buffered not-yet-closable event times — bounded by
    the watermark horizon, the standard streaming-sessionization bound.
    Output: (user, session_start_ms, session_end_ms, n_events), append-style
    (each closed session exactly once).
    """
    import re as _re

    def _ms(spec: str) -> int:
        m = _re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", spec.strip())
        if not m:
            raise ValueError(f"unsupported interval: {spec!r}")
        mult = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
        return int(m.group(1)) * mult[m.group(2)]

    gap_ms = _ms(gap)

    out_schema = StructType(
        [
            StructField("user", StringType()),
            StructField("session_start_ms", LongType()),
            StructField("session_end_ms", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType([StructField("buf", ArrayType(LongType()))])

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        buf = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            if len(pdf):
                # pandas datetime64[us/ns] -> epoch ms
                buf.extend(
                    int(v.value // 1_000_000) for v in pd.to_datetime(pdf[ts_col])
                )
        if not buf:
            if state.exists:
                state.remove()
            return
        buf.sort()
        wm = state.getCurrentWatermarkMs()
        sessions: list[list[int]] = [[buf[0]]]
        for t in buf[1:]:
            if t - sessions[-1][-1] > gap_ms:
                sessions.append([t])
            else:
                sessions[-1].append(t)
        closed = [s for s in sessions if s[-1] + gap_ms < wm]
        kept = [t for s in sessions if s[-1] + gap_ms >= wm for t in s]
        if kept:
            state.update((kept,))
        elif state.exists:
            state.remove()
        # else: new key whose sessions all closed in its first batch — yield
        # output WITHOUT touching state (valid in applyInPandasWithState), so
        # no empty per-key state accumulates under NoTimeout.
        if closed:
            yield pd.DataFrame(
                {
                    "user": [str(key[0])] * len(closed),
                    "session_start_ms": [s[0] for s in closed],
                    "session_end_ms": [s[-1] for s in closed],
                    "n_events": [len(s) for s in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
