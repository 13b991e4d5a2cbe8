"""Watermarked windowed aggregation + custom stateful sessionization.

Streaming analogs of the batch events operators (events_daily /
events_sessionize in `__spark_entry__.py`), built the Spark-first way:

* ``windowed_event_counts`` — ``readStream -> withWatermark ->
  groupBy(window) -> agg``: late rows beyond the watermark are dropped
  by the engine, finalized windows emit exactly once in append mode.
  State is bounded by (watermark horizon x group cardinality) — the
  100 TB-safe shape for time-series rollups.
* ``sessionize_stream`` — gap-based sessions via
  ``applyInPandasWithState`` (Arrow-batched custom stateful operator,
  the engine's escape hatch for semantics windowed aggs can't express):
  per-user state carries the open session only (three scalars, O(1) per
  key); sessions close and emit when the event-time watermark passes
  last_ts + gap, so state never grows with history. Semantics mirror
  the batch sessionize: a new session starts when the gap to the
  previous event exceeds ``gap`` (strictly greater), asserted
  stream==batch in tests/test_streaming_windows.py.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window event counts with late-data handling.

    Works identically on a batch or streaming DataFrame (in streaming
    append mode a window emits once, when the watermark passes its
    end; rows later than the watermark are dropped, not double-counted).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), group_col)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# open-session state: (session_start_us, last_ts_us, n_events)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_US = 1_000_000


def _session_fn(gap_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start_us, end_us, n)

        if state.hasTimedOut:
            # watermark passed last_ts + gap with no new events: the
            # open session is final.
            start_us, last_us, n = state.get
            closed.append((start_us, last_us, n))
            state.remove()
        else:
            rows = pd.concat(list(pdfs))
            ts_us = (
                rows["ts"].astype("datetime64[us]").astype("int64").sort_values()
            )
            # Gap-split over the sorted new events WITH the open session
            # inserted as an interval pseudo-item — this reproduces the
            # batch semantics for every late-but-within-watermark event:
            #   * inside [start-gap, last+gap]: merges (possibly pulling
            #     session_start backwards);
            #   * earlier than start-gap: forms its OWN earlier session
            #     (round-3 ADVICE: previously absorbed, start yanked back
            #     arbitrarily far), including chains of late events that
            #     bridge up to the open session.
            # Limitation (documented, unchanged): sessions closed in an
            # EARLIER trigger already emitted; a late event can no longer
            # merge into those. Early sessions closed HERE emit now, so a
            # still-later event that would have bridged into one is
            # likewise out of scope.
            items = [(int(t), int(t), 1) for t in ts_us]
            if state.exists:
                items.append(tuple(state.get))
                items.sort(key=lambda x: (x[0], x[1]))
            start_us, last_us, n = items[0]
            for s, e, c in items[1:]:
                if s - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = s, e, c
                else:
                    last_us = max(last_us, e)
                    n += c
            state.update((start_us, last_us, n))
            # close the open session once the event-time watermark
            # passes last_ts + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization of an event stream.

    Emits one row per CLOSED session (a session closes when the
    event-time watermark passes its last event + gap). Per-key state is
    three scalars — independent of history length — so a year-long
    stream over 10^9 users holds ~24 GB of state cluster-wide, not the
    event log.
    """
    stream = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    return stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * _US),
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
