"""Custom stateful streaming operator: per-user session windows via
``applyInPandasWithState`` (SURVEY.md §2.9 — the reference has no
streaming; this is the engine's arbitrary-stateful extension surface,
the thing watermarked built-in aggregations can't express).

Semantics: a session is a maximal run of a user's events where
consecutive gaps are ≤ ``gap``. Sessions are emitted when CLOSED —
either a later event arrives more than ``gap`` after the session's end
(possibly in a later micro-batch; the open session rides in the group
state across batches) — while the trailing session stays open in state.

Scale design: state per key is O(1) (start, end, count, sum — not the
events), so 100M users fit executor state stores; the state store
backend (RocksDB in production) checkpoints it per batch. Timestamps
are carried as int64 microseconds inside the state tuple — exact, no
pandas tz coercion.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

#: (start_us, end_us, n_events, sum_value) — O(1) per key.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _sessionize_fn(gap_us: int):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        # exact integer µs; sort by (ts, event_id) for a deterministic
        # fold regardless of arrival order within the batch
        rows["__us"] = rows["ts"].astype("int64") // 1000
        rows = rows.sort_values(["__us", "event_id"])

        # Fold the (sorted) batch into session runs, then interval-merge
        # the carried open session in by START order. The old fold
        # appended batch events onto the state tail unconditionally
        # (end_us = us), so a late cross-batch event moved the open
        # session's end BACKWARDS — emitting sessions with end < start
        # and splitting sessions that later events had already extended.
        # Interval merging handles cross-batch disorder exactly as long
        # as it is bounded by ``gap`` (the standard contract — pair with
        # an upstream watermark for harder lateness bounds): runs more
        # than ``gap`` before the open session close as their own
        # sessions, runs within it merge with min/max bounds.
        runs: list[tuple[int, int, int, float]] = []
        for us, value in zip(rows["__us"], rows["value"]):
            if runs and us - runs[-1][1] <= gap_us:
                s, e, n, total = runs[-1]
                runs[-1] = (s, max(e, us), n + 1, total + float(value))
            else:
                runs.append((us, us, 1, float(value)))
        if state.exists:
            runs.append(tuple(state.get))
            runs.sort(key=lambda r: (r[0], r[1]))

        merged: list[tuple[int, int, int, float]] = []
        for r in runs:
            if merged and r[0] - merged[-1][1] <= gap_us:
                s, e, n, total = merged[-1]
                merged[-1] = (
                    min(s, r[0]),
                    max(e, r[1]),
                    n + r[2],
                    total + r[3],
                )
            else:
                merged.append(r)
        closed = merged[:-1]

        state.update(merged[-1])
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_events": [c for *_, c, _ in closed],
                    "sum_value": [t for *_, t in closed],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Session windows over a streaming events DataFrame (needs
    ``event_id``, ``ts``, ``user_id``, ``value``). Emits one row per
    CLOSED session; the trailing open session per user persists in the
    group state across micro-batches."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_us),
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
