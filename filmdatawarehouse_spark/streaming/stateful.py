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


def _sessions_frame(user_id, closed):
    """Closed sessions -> one SESSION_OUT_SCHEMA pandas frame — shared by
    all three sessionizer variants so the twins cannot drift apart on
    output typing (r11 review: this was copy-pasted three times)."""
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(closed), dtype="int64"),
            "session_start": pd.to_datetime(
                pd.Series([c[0] for c in closed], dtype="int64"), unit="us"
            ),
            "session_end": pd.to_datetime(
                pd.Series([c[1] for c in closed], dtype="int64"), unit="us"
            ),
            "n_events": pd.Series([c[2] for c in closed], dtype="int64"),
        }
    )



def expiring_user_sessions(events: DataFrame, gap_seconds: int = 600) -> DataFrame:
    """Event-time sessionization with STATE EVICTION — the full custom-
    stateful pattern: per-user state holds the OPEN session only (count,
    first/last event time); when the watermark passes ``last_event + gap``
    the state TIMES OUT, the closed session is emitted exactly once, and
    the key's state is removed (bounded memory under unbounded keys — the
    property ``NoTimeout`` operators lack). Input must carry a watermark
    on ``ts``.

    Gap semantics match the batch twin ``windows.session_windows`` minus
    the ``+gap`` on the window end: a session BREAKS only when the
    inter-event gap is strictly greater than ``gap_seconds`` (events
    exactly ``gap`` apart merge). New events are sorted and split on gaps
    *within* a batch too, so a user whose 10:00 and 11:00 events arrive
    in one micro-batch still yields two sessions; every session closed by
    an observed later event is emitted in that same batch, not held until
    timeout. (A same-user event that is still above the watermark but
    lands in an already-emitted gap would be assigned to a new session —
    the inherent cost of emitting on split without buffering whole event
    lists in state; the watermark bounds how late such an event can be.)
    """

    gap_us = gap_seconds * 1_000_000

    _emit = _sessions_frame

    def update(key, pdf_iter, state: GroupState):
        import numpy as np

        (user_id,) = key
        if state.hasTimedOut:
            n, start_us, last_us = state.get
            state.remove()
            yield _emit(user_id, [(start_us, last_us, n)])
            return
        chunks = [
            (pdf["ts"].astype("int64") // 1000).to_numpy() for pdf in pdf_iter
        ]
        ts_us = np.sort(np.concatenate(chunks)) if chunks else np.array([], "int64")
        if state.exists:
            n, start_us, last_us = state.get
        else:
            n, start_us, last_us = 0, None, None
        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            t = int(t)
            if start_us is None:
                n, start_us, last_us = 1, t, t
            elif t - last_us > gap_us:
                # gap observed in-stream: close the session NOW (the batch
                # twin would split here too) instead of folding across it
                closed.append((start_us, last_us, n))
                n, start_us, last_us = 1, t, t
            else:
                n += 1
                start_us = min(start_us, t)
                last_us = max(last_us, t)
        state.update((n, start_us, last_us))
        # the surviving open session closes when the event-time watermark
        # passes its last event + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        yield _emit(user_id, closed)

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def expiring_user_sessions_tws(
    events: DataFrame, gap_seconds: int = 600
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    ``expiring_user_sessions`` — identical gap/timeout/eviction
    semantics and output schema, implemented on the StatefulProcessor
    API that supersedes ``applyInPandasWithState``: named state
    variables, TRUE per-key timers (several may coexist; explicit
    register/delete instead of one implicit timeout slot), optional
    state TTL, and initial-state bootstrap. This is the forward path
    for custom stateful operators at scale; the ``applyInPandasWithState``
    form stays as the Spark-3.x-portable twin, and the equality test
    drives both over the same input.

    Timer discipline (the one real semantic difference to manage): the
    old API's ``setTimeoutTimestamp`` REPLACED the key's single timeout,
    while ``registerTimer`` ACCUMULATES — so the processor deletes the
    previous deadline before registering the new one, and the expiry
    handler double-checks the fired timer against the state's current
    deadline (a stale timer for an older ``last_us`` must be a no-op,
    never a premature close).

    ENVIRONMENT GATE: the StatefulProcessor runtime speaks protobuf to
    the JVM (``pyspark/sql/streaming/proto``), and ``google.protobuf``
    is not installed in this container — the plan BUILDS here (pinned
    by the always-on test) but the stream start needs protobuf, so the
    execution-equality test vs the applyInPandasWithState twin is
    skipif-gated on ``import google.protobuf`` (the MySQL-connector /
    media-codec honesty pattern: real code, documented boundary)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000

    _frame = _sessions_frame

    def _deadline_ms(last_us: int) -> int:
        return last_us // 1000 + gap_seconds * 1000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.open = handle.getValueState(
                "open_session", SESSION_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            (user_id,) = key
            chunks = [
                (pdf["ts"].astype("int64") // 1000).to_numpy()
                for pdf in rows
            ]
            ts_us = (
                np.sort(np.concatenate(chunks))
                if chunks
                else np.array([], "int64")
            )
            if self.open.exists():
                n, start_us, last_us = self.open.get()
                self.handle.deleteTimer(_deadline_ms(last_us))
            else:
                n, start_us, last_us = 0, None, None
            closed = []
            for t in ts_us:
                t = int(t)
                if start_us is None:
                    n, start_us, last_us = 1, t, t
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    n, start_us, last_us = 1, t, t
                else:
                    n += 1
                    start_us = min(start_us, t)
                    last_us = max(last_us, t)
            if start_us is not None:
                self.open.update((n, start_us, last_us))
                self.handle.registerTimer(_deadline_ms(last_us))
            yield _frame(user_id, closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if not self.open.exists():
                return  # stale timer after the state already closed
            n, start_us, last_us = self.open.get()
            if expiredTimerInfo.getExpiryTimeInMs() != _deadline_ms(
                last_us
            ):
                return  # stale timer for an older last_us
            self.open.clear()
            yield _frame(user_id, [(start_us, last_us, n)])

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


CAPPED_STATE_SCHEMA = (
    "n bigint, gap_start_us bigint, slice_idx bigint, "
    "slice_start_us bigint, last_us bigint"
)


def expiring_capped_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    cap_seconds: int = 3600,
) -> DataFrame:
    """Streaming twin of the batch ``events_sessions_capped`` query
    (queries/timeseries.py): gap-sessionization PLUS the max-duration cap
    — each gap-session is time-sliced at ``cap_seconds`` boundaries from
    its start, so no emitted session row can span more than the cap even
    for an endlessly-active key. Same state-eviction contract as
    ``expiring_user_sessions`` (open slice only; EventTimeTimeout closes
    and evicts); slices closed by an observed boundary crossing are
    emitted in that same batch.

    Equivalence with the batch query is pinned by
    tests/test_streaming.py::test_stateful_capped_sessions_equal_batch
    over a multi-batch replay.
    """
    gap_us = gap_seconds * 1_000_000
    cap_us = cap_seconds * 1_000_000

    _emit = _sessions_frame

    def update(key, pdf_iter, state: GroupState):
        import numpy as np

        (user_id,) = key
        if state.hasTimedOut:
            n, _gap_start, _idx, slice_start, last_us = state.get
            state.remove()
            yield _emit(user_id, [(slice_start, last_us, n)])
            return
        chunks = [
            (pdf["ts"].astype("int64") // 1000).to_numpy() for pdf in pdf_iter
        ]
        ts_us = np.sort(np.concatenate(chunks)) if chunks else np.array([], "int64")
        if state.exists:
            n, gap_start, idx, slice_start, last_us = state.get
        else:
            n, gap_start, idx, slice_start, last_us = 0, None, 0, None, None
        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            t = int(t)
            if gap_start is None:
                n, gap_start, idx, slice_start, last_us = 1, t, 0, t, t
            elif t - last_us > gap_us:
                # inactivity gap: close the open slice, start a new session
                closed.append((slice_start, last_us, n))
                n, gap_start, idx, slice_start, last_us = 1, t, 0, t, t
            else:
                new_idx = (t - gap_start) // cap_us
                if new_idx != idx:
                    # duration cap: close the slice, same gap-session
                    closed.append((slice_start, last_us, n))
                    n, idx, slice_start = 1, new_idx, t
                    last_us = t
                else:
                    n += 1
                    last_us = max(last_us, t)
        state.update((n, gap_start, idx, slice_start, last_us))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        yield _emit(user_id, closed)

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=CAPPED_STATE_SCHEMA,
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


MG_BUCKETS = 8
MG_STATE_K = 64
HH_OUT_SCHEMA = "bucket int, seq bigint, word string, est bigint"
HH_STATE_SCHEMA = "words array<string>, counts array<long>, seq bigint"


def streaming_mg_candidates(
    tokens: DataFrame,
    n_buckets: int = MG_BUCKETS,
    k: int = MG_STATE_K,
) -> DataFrame:
    """Streaming Misra–Gries heavy-hitter CANDIDATES with bounded state:
    the token stream hash-partitions by word into ``n_buckets`` buckets,
    and each bucket carries one MG summary (≤ ``k`` counters) across
    micro-batches in ``applyInPandasWithState``. Total state is
    n_buckets × k counters REGARDLESS of stream length — the streaming
    twin of ``operators/frequent.mg_candidates``.

    Superset guarantee (same argument as the batch pass, per bucket): a
    word's entire count lands in exactly ONE bucket (hash partitioning
    by word), so a word with global count C > N/k has C > n_bucket/k in
    its bucket and must survive that bucket's summary. The union of
    per-bucket survivors therefore contains every global 1/k-heavy
    hitter — which is what makes an EXACT recount over the candidates
    possible downstream (queries/streaming_twin.stream_heavy_hitters).

    Each batch emits the bucket's updated summary tagged with a
    monotonically increasing ``seq``; the FINAL summary per bucket is
    the row set with that bucket's maximum seq (update-mode sinks retain
    all emissions). Input must be a streaming frame with one ``word``
    column; ``bucket`` is derived here so callers can't mis-partition.
    """
    from pyspark.sql import functions as F

    def update(key, pdf_iter, state: GroupState):
        counters: pd.Series | None = None
        if state.exists:
            words, counts, seq = state.get
            counters = pd.Series(list(counts), index=list(words), dtype="int64")
        else:
            seq = 0
        for pdf in pdf_iter:
            hist = pdf["word"].value_counts()
            if counters is None:
                merged = hist
            else:
                # reindex-to-union + int add, NOT Series.add(fill_value=0):
                # fill_value promotes int64→float64, making MG estimates
                # exact only while counts stay below 2^53. Keep counter
                # arithmetic in int64 by construction.
                union = counters.index.union(hist.index)
                merged = counters.reindex(union, fill_value=0).astype(
                    "int64"
                ) + hist.reindex(union, fill_value=0).astype("int64")
            if len(merged) > k:
                kth = merged.nlargest(k + 1).iloc[-1]
                merged = merged[merged > kth] - kth
            counters = merged
        if counters is None:
            counters = pd.Series(dtype="int64")
        seq = int(seq) + 1
        state.update(
            (list(counters.index), [int(c) for c in counters], seq)
        )
        (bucket,) = key
        yield pd.DataFrame(
            {
                "bucket": pd.Series([int(bucket)] * len(counters), dtype="int32"),
                "seq": pd.Series([seq] * len(counters), dtype="int64"),
                "word": counters.index.astype(str),
                "est": counters.to_numpy("int64"),
            }
        )

    return (
        tokens.withColumn(
            "bucket",
            F.pmod(F.xxhash64("word"), F.lit(n_buckets)).cast("int"),
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            update,
            outputStructType=HH_OUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
