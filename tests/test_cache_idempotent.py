"""Idempotence of ``managed_persist`` on the LOGICAL PLAN (r13, VERDICT
r12 item 1).

The r12 driver bench's warm pass showed repeated ``CacheManager: Asked
to cache already cached data`` warnings and a 5.9 s warm outlier on
`orders_abc_pareto`: every warm re-invocation of a query built a fresh
DataFrame over an already-cached plan and re-called ``persist()``, which
both spams the CacheManager and appends a dead handle to the managed
registry per invocation. ``managed_persist`` now checks the plan-keyed
JVM CacheManager (the per-object ``is_cached`` flag cannot see an
equivalent plan cached via another handle) and returns untouched when
the plan is already cached.
"""

from __future__ import annotations

from filmdatawarehouse_spark.operators import cache


def _fresh_frame(spark):
    # new DataFrame OBJECT each call, identical logical plan
    return spark.range(100).selectExpr("id", "id * 3 as tripled")


def test_same_plan_registered_once(spark):
    cache.release_managed()
    base = len(cache._MANAGED)
    a = cache.managed_persist(_fresh_frame(spark))
    for _ in range(4):  # warm-loop shape: fresh handle, same plan
        cache.managed_persist(_fresh_frame(spark))
    assert len(cache._MANAGED) == base + 1  # only the first registered
    assert a.storageLevel.useMemory
    assert cache.release_managed() >= 1
    # after release the plan is uncached again — a new call re-persists
    b = cache.managed_persist(_fresh_frame(spark))
    assert b.storageLevel.useMemory
    assert len(cache._MANAGED) == 1
    cache.release_managed()


def test_externally_cached_plan_is_not_adopted(spark):
    """A plan cached by an OUTSIDE owner (plain .persist()) must not be
    registered: release_managed would otherwise drop a cache the caller
    still owns."""
    cache.release_managed()
    owner = _fresh_frame(spark).persist()
    try:
        out = cache.managed_persist(_fresh_frame(spark))
        assert len(cache._MANAGED) == 0
        cache.release_managed()
        # the outside owner's cache survived the release
        assert owner.storageLevel.useMemory
        assert out.sparkSession is spark
    finally:
        owner.unpersist()


def test_distinct_plans_both_registered(spark):
    cache.release_managed()
    # genuinely different computations — a bare rename canonicalizes to
    # the same plan (Alias names are erased by sameResult) and is
    # correctly treated as already cached
    cache.managed_persist(spark.range(10).selectExpr("id + 1 as a"))
    cache.managed_persist(spark.range(10).selectExpr("id + 2 as b"))
    assert len(cache._MANAGED) == 2
    assert cache.release_managed() == 2
