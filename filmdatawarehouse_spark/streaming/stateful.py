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
