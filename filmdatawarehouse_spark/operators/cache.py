"""Owner-managed persist registry.

Python (`mapInPandas`) stages are opaque to Catalyst: a frame feeding 2+
plan branches re-executes per branch unless persisted, so the dedup
operators persist their signature frames. But DataFrame persists are keyed
on the logical plan in the session CacheManager and are NOT released when
the Python object dies — repeated invocations in one session accumulate
cache entries (and "already cached" warnings).

``managed_persist`` tracks every such frame; callers that materialize a
returned plan (bench loops, tests, long-lived services) call
``release_managed()`` afterwards to drop the cache blocks. Inside one
query's execution the cache is still shared across branches — release only
removes it for FUTURE executions, which then simply re-persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MANAGED: list[DataFrame] = []


def managed_persist(df: DataFrame) -> DataFrame:
    """Persist (MEMORY_AND_DISK) and register for later release."""
    df.persist()
    _MANAGED.append(df)
    return df


def release_managed() -> int:
    """Unpersist every registered frame; returns how many were released."""
    n = 0
    while _MANAGED:
        df = _MANAGED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
