"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` — the Structured Streaming form of the batch
``events_sessionize`` contract query (30-minute gap rule).

The reference has no streaming surface (SURVEY.md §2.9); this is the
Spark-native extension a transcript/event pipeline needs: arbitrary
per-key state (open session) maintained across micro-batches, sessions
emitted when CLOSED — either a later event arrives past the gap, or the
event-time watermark passes the open session's timeout.

State per user: (session_start, last_ts, n_events) as epoch-micros
longs.  Output: one row per closed session
(user_id, session_start, session_end, n_events).

Scale shape: state is hash-partitioned by user_id across executors
(Spark's state store), each micro-batch touches only keys with new
events plus timed-out keys — no global state, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MINUTES = 30

OUTPUT_SCHEMA = (
    "user_id string, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"

_US = 1_000_000  # micros per second


def merge_sorted_events(
    t, state: tuple[int, int, int] | None, gap_us: int
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """Apply the gap rule to sorted event times (epoch micros) given the
    carried open session — vectorized: O(events) numpy, O(sessions)
    Python.  Returns (closed sessions, new open session), each session a
    (start, last, n) triple.

    A boundary at i means t[i] is > gap past the running session max;
    the carried ``last`` can only influence comparisons up to the first
    boundary (any boundary value already exceeds last + gap, and t is
    sorted), so seeding the running max with ``last`` reproduces the
    scalar one-event-at-a-time semantics exactly (property-tested
    against it in ``tests/test_streaming.py``).
    """
    import numpy as np

    start, last, n = state if state is not None else (None, None, None)
    closed: list[tuple[int, int, int]] = []
    if not t.size:
        return closed, state
    if start is None:
        flags = np.empty(t.size, dtype=bool)
        flags[0] = True
        flags[1:] = (t[1:] - t[:-1]) > gap_us
    else:
        prevmax = np.maximum.accumulate(
            np.concatenate((np.array([last], dtype="int64"), t))
        )[:-1]
        flags = (t - prevmax) > gap_us
    seg_starts = np.unique(
        np.concatenate((np.array([0], dtype="int64"), np.flatnonzero(flags)))
    )
    seg_ends = np.concatenate((seg_starts[1:], np.array([t.size])))
    for j, (s0, e0) in enumerate(zip(seg_starts, seg_ends)):
        if j == 0 and start is not None and not flags[0]:
            # first segment extends the open session
            last = max(last, int(t[e0 - 1]))
            n += int(e0 - s0)
            continue
        if start is not None:
            closed.append((start, last, n))
        start, last, n = int(t[s0]), int(t[e0 - 1]), int(e0 - s0)
    return closed, (start, last, n)


def _session_kernel(gap_us: int):
    """Build the per-key stateful kernel (gap captured in the closure)."""

    def kernel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start, end, n)

        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((start, last, n))
            state.remove()
        else:
            import numpy as np

            carried = tuple(state.get) if state.exists else None
            parts = [
                pd.to_datetime(pdf["ts"]).astype("int64").to_numpy() // 1000
                for pdf in pdfs
            ]
            t = np.sort(np.concatenate(parts)) if parts else np.array([], dtype="int64")
            closed, open_s = merge_sorted_events(t, carried, gap_us)
            start, last, n = open_s if open_s is not None else (None, None, None)
            if start is not None:
                state.update((int(start), int(last), int(n)))
                # close the open session when the watermark passes
                # last_ts + gap (no more on-time events can extend it);
                # clamped above the current watermark — Spark rejects
                # timeout timestamps at/behind it
                timeout_ms = int(last) // 1000 + gap_us // 1000
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _e, _n in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _s, e, _n in closed],
                    "n_events": [n for _s, _e, n in closed],
                }
            )

    return kernel


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = GAP_MINUTES,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming events (user_id, ts, ...) → closed sessions.

    ``events`` must be a streaming DataFrame; late rows beyond the
    watermark are dropped, open sessions close via event-time timeout.
    """
    gap_us = gap_minutes * 60 * _US
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_kernel(gap_us),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
