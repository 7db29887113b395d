"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the pattern for operators Structured
Streaming lacks as builtins — per-key mutable state with timeout).

A session = consecutive events of one user with gaps ≤ ``gap``. State
per user carries (session_start, last_ts, n_events, sum_value); a
processing-time timeout flushes idle sessions.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, session_start timestamp, session_end timestamp, "
                 "n_events long, sum_value double")
STATE_SCHEMA = "start long, last long, n long, total double"


def _sessionize_fn(gap_seconds: int, event_time: bool = False):
    gap_us = gap_seconds * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield _row(user_id, start, last, n, total)
            return
        start, last, n, total = state.get if state.exists else (None, None, 0, 0.0)
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                us = int(ts.value // 1000)  # pandas ns → µs
                v = float(value) if value == value else 0.0
                if start is None:
                    start, last, n, total = us, us, 1, v
                elif us - last <= gap_us:
                    last, n, total = us, n + 1, total + v
                else:
                    closed.append((start, last, n, total))
                    start, last, n, total = us, us, 1, v
        if start is not None:
            state.update((start, last, n, total))
            if event_time:
                # fires when the WATERMARK passes session_end + gap:
                # deterministic, data-driven, terminates under availableNow
                state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
            else:
                state.setTimeoutDuration(gap_seconds * 1000)
        for c in closed:
            yield _row(user_id, *c)

    return fn


def _row(user_id, start, last, n, total) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.Series([user_id], dtype="int64"),
        "session_start": [pd.Timestamp(start, unit="us")],
        "session_end": [pd.Timestamp(last, unit="us")],
        "n_events": pd.Series([n], dtype="int64"),
        "sum_value": pd.Series([total], dtype="float64"),
    })


def sessionize(events_stream, gap_seconds: int = 1800,
               user_col: str = "user_id", event_time: bool = False,
               watermark_delay: str = "0 seconds"):
    """events (user_id, ts, value) stream → closed-session rows.
    Update-mode stateful op; idle sessions flush on timeout.

    ``event_time=True`` uses a watermark + event-time timeouts: session
    flushes are driven by the DATA clock, so results are deterministic
    and a bounded (availableNow) run terminates — processing-time
    timeouts instead keep scheduling empty batches while state remains
    and flush wall-clock-dependently."""
    stream = events_stream
    timeout = GroupStateTimeout.ProcessingTimeTimeout
    if event_time:
        stream = stream.withWatermark("ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    return (
        stream
        .groupBy(user_col)
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds, event_time=event_time),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
