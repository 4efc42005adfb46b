"""Custom stateful streaming: session tracking with
``applyInPandasWithState`` — the arbitrary-state operator for semantics
the built-in windowed aggregations can't express (session re-entry,
per-key counters that outlive any window, custom eviction).

State: one (n_events, session_start_ms, last_ms, n_sessions) record per
user.  A new event extends the current session unless the gap exceeds
``gap_ms``; state evicts via processing-time timeout, emitting the
user's final totals.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, n_sessions BIGINT, last_ms BIGINT, closed BOOLEAN"
)
STATE_SCHEMA = "n_events BIGINT, n_sessions BIGINT, session_last_ms BIGINT"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n_events, n_sessions, last_ms = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, n_events, n_sessions, last_ms, True)],
            columns=["user_id", "n_events", "n_sessions", "last_ms", "closed"],
        )
        return

    n_events, n_sessions, last_ms = state.get if state.exists else (0, 0, None)
    gap_ms = 30 * 60 * 1000
    new_events = 0
    for pdf in pdfs:
        for ts_ms in sorted(int(t) for t in pdf["ts_ms"]):
            if last_ms is None or ts_ms - last_ms > gap_ms:
                n_sessions += 1
            # cross-batch out-of-order events join the current session
            # without regressing its end (same rule as the event-time
            # variant)
            last_ms = ts_ms if last_ms is None else max(last_ms, ts_ms)
            new_events += 1
    n_events += new_events
    state.update((n_events, n_sessions, last_ms))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict after 1h idle
    yield pd.DataFrame(
        [(user_id, n_events, n_sessions, last_ms, False)],
        columns=["user_id", "n_events", "n_sessions", "last_ms", "closed"],
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """(user_id, n_events, n_sessions, last_ms, closed) — running
    per-user session totals over a stream of (user_id, ts_ms).

    Works on a streaming DataFrame (update mode).  Arrow-batched: each
    trigger hands the UDF one pandas frame per user per micro-batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _make_event_time_update(gap_ms: int):
    """Event-time variant of :func:`_update`: the state's timeout is the
    session deadline (last event + gap) in EVENT time, so a session
    closes exactly when the watermark passes its gap — late data inside
    the watermark still extends the right session, and eviction is
    data-driven, not wall-clock-driven."""

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n_events, n_sessions, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, n_events, n_sessions, last_ms, True)],
                columns=["user_id", "n_events", "n_sessions", "last_ms", "closed"],
            )
            return

        n_events, n_sessions, last_ms = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            # ts arrives as pandas datetime64[ns] (TIMESTAMP column)
            for ts_ms in sorted(int(t.value // 1_000_000) for t in pdf["ts"]):
                if last_ms is None or ts_ms - last_ms > gap_ms:
                    n_sessions += 1
                # a late in-watermark event (ts_ms < last_ms, a LATER
                # batch) joins the current session but must never
                # regress its end: the deadline stays last-event + gap
                last_ms = ts_ms if last_ms is None else max(last_ms, ts_ms)
                n_events += 1
        state.update((n_events, n_sessions, last_ms))
        # close when the WATERMARK (not the clock) passes the gap
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(
            [(user_id, n_events, n_sessions, last_ms, False)],
            columns=["user_id", "n_events", "n_sessions", "last_ms", "closed"],
        )

    return update


def sessionize_event_time(
    events: DataFrame,
    *,
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time sessionization over a stream of (user_id, ts TIMESTAMP)
    with watermark-based state eviction.

    The watermark bounds both late data admission and state size: each
    user's state lives until the watermark passes their last event +
    gap, then the closed session is emitted and the state removed —
    bounded state at any input scale, the property that makes this safe
    on an unbounded 100 TB/day stream.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_event_time_update(gap_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
