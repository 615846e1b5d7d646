"""Custom stateful streaming operators via applyInPandasWithState.

The reference had no streaming at all (SURVEY §1.1); this is the
beyond-reference extension showing the engine's streaming posture for
operators that windowed aggregation can't express: per-key evolving state
with event-time timeouts.

``streaming_sessionize`` — gap-based sessions over an event stream:
state per user = (open-session start, last event time, event count), all as
epoch-microsecond longs. Requires the session timezone to be UTC (the engine
pins it — get_spark/prep): Arrow hands the UDF tz-naive timestamps, so under
a non-UTC session zone the event-time timeout target would be offset by the
zone and sessions would flush early. A session closes
when a later event arrives more than ``gap`` after the last one (emitted
immediately) or when the event-time watermark passes last+gap (timeout path —
so idle users' final sessions DO emit without waiting for their next visit).

Scale: one shuffle on the user key; state store holds one 3-long tuple per
active user; Arrow batches stream per group. This is exactly the shape that
survives 1000 executors — no collect, no driver state.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events int"
)
_STATE_SCHEMA = "start long, last long, n int"


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming gap-sessionization. Returns a streaming DataFrame of CLOSED
    sessions (append mode): (user_id, session_start, session_end, n_events).
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []

        def close():
            closed.append(
                (
                    key[0],
                    pd.Timestamp(start * 1000, unit="ns"),
                    pd.Timestamp(last * 1000, unit="ns"),
                    n,
                )
            )

        if state.hasTimedOut:
            # watermark passed last+gap with no new events: flush the session
            if start is not None:
                close()
            state.remove()
        else:
            ts_parts = [pdf[ts_col] for pdf in pdfs]
            ts = pd.concat(ts_parts).sort_values() if ts_parts else pd.Series([])
            for t in ts:
                t_us = t.value // 1000  # pandas Timestamp.value is nanoseconds
                if start is None:
                    start, last, n = t_us, t_us, 1
                elif t_us - last > gap_us:
                    close()
                    start, last, n = t_us, t_us, 1
                else:
                    last, n = max(last, t_us), n + 1
            if start is not None:
                state.update((int(start), int(last), int(n)))
                # event-time timeout fires when the watermark passes this
                state.setTimeoutTimestamp((last + gap_us) // 1000)  # millis
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
