"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's example of arbitrary per-key state (the pattern behind
sessionization variants, dedup-in-stream, rate limiting): a running per-user
event counter + value accumulator that carries state across micro-batches and
emits the updated totals for users seen in each batch.

Batch-mode twin: the final emission after one availableNow pass over static
data equals a plain groupBy — which is exactly what the DuckDB oracle checks
in queries/extended (events are replayed in a single batch there).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
SESSION_STATE_SCHEMA = "n bigint, start_us bigint, last_us bigint"


def expiring_user_sessions(events: DataFrame, gap_seconds: int = 600) -> DataFrame:
    """Event-time sessionization with STATE EVICTION — the full custom-
    stateful pattern: per-user state accumulates (count, first/last event
    time); when the watermark passes ``last_event + gap`` the state TIMES
    OUT, the closed session is emitted exactly once, and the key's state
    is removed (bounded memory under unbounded keys — the property
    ``NoTimeout`` operators lack). Emits ONLY closed sessions; input must
    carry a watermark on ``ts``.
    """
    import datetime

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, start_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [
                        datetime.datetime.utcfromtimestamp(start_us / 1e6)
                    ],
                    "session_end": [
                        datetime.datetime.utcfromtimestamp(last_us / 1e6)
                    ],
                    "n_events": [n],
                }
            )
            return
        if state.exists:
            n, start_us, last_us = state.get
        else:
            n, start_us, last_us = 0, None, None
        for pdf in pdf_iter:
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            n += len(ts_us)
            lo, hi = int(ts_us.min()), int(ts_us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, start_us, last_us))
        # close when the event-time watermark passes last event + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
            }
        )

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user running (count, value-sum), updated
    each micro-batch a user appears in. Input needs columns (user_id, value).
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
