"""Owner-managed persist registry.

Python (`mapInPandas`) stages are opaque to Catalyst: a frame feeding 2+
plan branches re-executes per branch unless persisted, so the dedup
operators persist their signature frames. But DataFrame persists are keyed
on the logical plan in the session CacheManager and are NOT released when
the Python object dies — repeated invocations in one session accumulate
cache entries (and "already cached" warnings).

``managed_persist`` tracks every such frame; callers that materialize a
returned plan (bench loops, tests, long-lived services) call
``release_managed()`` afterwards to drop the cache blocks.

The registry deliberately holds STRONG references: an operator typically
drops its own handle right after building the derived plans (the registry
is then the only live reference), and a weak registry could never
unpersist those entries — exactly the leak this module exists to close.
The cost is explicit ownership: **long-lived services MUST call
``release_managed()`` once per request/batch**, or the registry grows by
one entry per ``managed_persist`` call and pins every persisted frame
alive until the session ends. Both functions are thread-safe (one lock
around the registry; Spark's CacheManager handles concurrent
persist/unpersist).

Inside one query's execution the cache is still shared across branches —
release only removes it for FUTURE executions, which then simply
re-persist.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_MANAGED: list[DataFrame] = []
_GENERATION = 0


def cache_generation() -> int:
    """Monotone counter bumped by every ``release_managed()``.

    Memoized providers that hand out a shared persisted frame (e.g. the
    PPJoin pair frame used by both `text_prefix_filter_pairs` and
    `graph_bfs_hops`) key their memo on this: after a release their cached
    handle still *works* but is no longer persisted, so silently reusing
    it would demote every downstream consumer to recompute-per-branch.
    A generation mismatch tells the provider to rebuild + re-persist.
    """
    with _LOCK:
        return _GENERATION


def _plan_already_cached(df: DataFrame) -> bool:
    """True when the session CacheManager already holds this LOGICAL PLAN.

    PySpark's ``DataFrame.is_cached`` is a per-object Python flag set by
    ``.persist()`` on that exact handle — a fresh DataFrame over an
    identical plan (every re-invocation of a registered query builds one)
    reports False even though the JVM CacheManager would substitute the
    cached InMemoryRelation. Idempotence needs the plan-keyed JVM lookup.
    """
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        return bool(cm.lookupCachedData(df._jdf).isDefined())
    except Exception:  # non-classic session / internal API moved — persist
        return False


def managed_persist(df: DataFrame) -> DataFrame:
    """Persist (MEMORY_AND_DISK) and register for later release.

    Idempotent on the LOGICAL PLAN (VERDICT r12 item 1): when a warm loop
    re-invokes a query whose shared frame is still cached from the prior
    run, re-calling ``persist()`` on the fresh handle spams the
    CacheManager ("Asked to cache already cached data") and grows the
    registry by one dead entry per invocation. If the plan is already in
    the CacheManager, return the frame untouched — whoever cached it
    (an earlier managed_persist, or an outside owner) keeps ownership of
    the release.
    """
    if _plan_already_cached(df):
        return df
    df.persist()
    with _LOCK:
        _MANAGED.append(df)
    return df


def release_managed() -> int:
    """Unpersist every registered frame; returns how many were released."""
    global _GENERATION
    with _LOCK:
        frames, _MANAGED[:] = list(_MANAGED), []
        _GENERATION += 1
    n = 0
    for df in frames:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
