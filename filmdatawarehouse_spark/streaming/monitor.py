"""Streaming observability: a StreamingQueryListener that turns Spark's
per-micro-batch progress events into a queryable in-process metrics
table.

An exactly-once pipeline that cannot answer "how many rows did batch N
ingest, how long did it take, how big is the state store" is not
production-shaped; operators watch exactly these three numbers to catch
watermark stalls (inputRows > 0 but no state eviction), sink slowdowns
(triggerExecution growing batch over batch), and replay storms
(batch ids repeating after restarts). Spark already emits all of it on
the listener bus — this module just keeps the driver-side tail of it
(bounded deque per query, O(max_batches) memory) and exposes snapshots
as plain dicts / a DataFrame for dashboards or assertions.

No reference analog (the reference is batch-only); standard Spark
listener API (pyspark.sql.streaming.listener).
"""

from __future__ import annotations

import threading
from collections import OrderedDict, deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener

_MAX_BATCHES = 256  # per query; a bounded ops tail, not an event store
_MAX_QUERIES = 64  # LRU across queries — each fresh checkpoint/start is a
# NEW query id (the repo's own write_stream_merge_* pattern), so a
# long-lived service would otherwise leak one deque per start forever


class StreamMetricsListener(StreamingQueryListener):
    """Collects (query name/id, batch_id, rows, rates, durations, state
    rows) per progress event. Thread-safe: the listener bus delivers on
    its own thread. Memory is bounded BOTH ways: ``max_batches`` per
    query and ``max_queries`` least-recently-active query tails."""

    def __init__(
        self,
        max_batches: int = _MAX_BATCHES,
        max_queries: int = _MAX_QUERIES,
    ) -> None:
        self._lock = threading.Lock()
        self._max = max_batches
        self._max_queries = max_queries
        self._progress: OrderedDict[str, deque] = OrderedDict()
        self._terminated: OrderedDict[str, str | None] = OrderedDict()

    def _touch(self, qid: str) -> deque:
        """Move/insert ``qid`` as most-recently-active; evict the oldest
        tails past the cap. Caller holds the lock."""
        if qid in self._progress:
            self._progress.move_to_end(qid)
        else:
            self._progress[qid] = deque(maxlen=self._max)
        while len(self._progress) > self._max_queries:
            self._progress.popitem(last=False)
        while len(self._terminated) > self._max_queries:
            self._terminated.popitem(last=False)
        return self._progress[qid]

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._touch(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        state_rows = sum(
            (s.numRowsTotal or 0) for s in (p.stateOperators or [])
        )
        row = {
            "query_id": str(p.id),
            "name": p.name,
            "batch_id": p.batchId,
            "input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "trigger_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": state_rows,
        }
        with self._lock:
            self._touch(str(p.id)).append(row)

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self._terminated[str(event.id)] = event.exception
            self._terminated.move_to_end(str(event.id))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - bus-dependent
        pass

    # -- read side ----------------------------------------------------------
    def snapshot(self) -> list[dict]:
        """All collected batch rows (copy), ordered per query by batch."""
        with self._lock:
            return [r for dq in self._progress.values() for r in dq]

    def failures(self) -> dict[str, str]:
        """query_id -> exception string for terminated-with-error queries."""
        with self._lock:
            return {
                qid: exc
                for qid, exc in self._terminated.items()
                if exc is not None
            }

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The metrics tail as a DataFrame (empty-safe) for dashboards."""
        schema = (
            "query_id string, name string, batch_id long, input_rows long, "
            "rows_per_sec double, trigger_ms long, state_rows long"
        )
        rows = [
            tuple(r[k] for k in (
                "query_id", "name", "batch_id", "input_rows",
                "rows_per_sec", "trigger_ms", "state_rows",
            ))
            for r in self.snapshot()
        ]
        return spark.createDataFrame(rows, schema)


def attach_metrics(
    spark: SparkSession, max_batches: int = _MAX_BATCHES
) -> StreamMetricsListener:
    """Create, register, and return a metrics listener. Caller detaches
    with ``spark.streams.removeListener(listener)`` when done."""
    listener = StreamMetricsListener(max_batches)
    spark.streams.addListener(listener)
    return listener
