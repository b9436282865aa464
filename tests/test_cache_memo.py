"""The generation-keyed PPJoin pair-frame memo (queries/extended.py)
against the release race found in ADVICE r08: a ``release_managed()``
landing between the memo's generation capture and its persist used to
leave a persisted frame keyed to a dead generation — rebuilt and
double-persisted on every later call until the next release."""

from __future__ import annotations


def test_pair_memo_reuses_across_calls_and_rebuilds_after_release(
    spark, sf_dir
):
    from filmdatawarehouse_spark.operators import cache
    from filmdatawarehouse_spark.queries import extended

    cache.release_managed()
    extended._SHARED_MEMO.clear()
    a = extended.prefix_filter_pairs_shared(spark, sf_dir)
    assert extended.prefix_filter_pairs_shared(spark, sf_dir) is a
    cache.release_managed()
    b = extended.prefix_filter_pairs_shared(spark, sf_dir)
    assert b is not a  # stale handle is no longer persisted — must rebuild
    assert b.storageLevel.useMemory
    cache.release_managed()


def test_pair_memo_survives_release_racing_the_persist(
    spark, sf_dir, monkeypatch
):
    """Simulate the ADVICE r08 interleaving deterministically: the first
    ``managed_persist`` is immediately followed by a ``release_managed``
    (as a concurrent consumer would do), bumping the generation after the
    memo captured it. The memo must detect the mismatch, rebuild, and end
    with a PERSISTED frame keyed to the live generation — not a dead-key
    entry that forces a rebuild per call."""
    from filmdatawarehouse_spark.operators import cache
    from filmdatawarehouse_spark.queries import extended

    cache.release_managed()
    extended._SHARED_MEMO.clear()
    real = cache.managed_persist
    raced = {"done": False}

    def racy_persist(df):
        out = real(df)
        if not raced["done"]:
            raced["done"] = True
            cache.release_managed()
        return out

    monkeypatch.setattr(cache, "managed_persist", racy_persist)
    df = extended.prefix_filter_pairs_shared(spark, sf_dir)
    assert raced["done"]
    assert df.storageLevel.useMemory  # the survivor is actually persisted
    monkeypatch.setattr(cache, "managed_persist", real)
    # keyed to the LIVE generation: the next call reuses, never rebuilds
    assert extended.prefix_filter_pairs_shared(spark, sf_dir) is df
    cache.release_managed()


def test_shared_memo_names_are_independent(spark, sf_dir):
    """The generalized memo (r09) holds one live frame PER name: building
    the MinHash pair frame must not evict the PPJoin frame, and all five
    MinHash consumers must receive the identical persisted object."""
    from filmdatawarehouse_spark.operators import cache
    from filmdatawarehouse_spark.queries import extended

    cache.release_managed()
    extended._SHARED_MEMO.clear()
    pp = extended.prefix_filter_pairs_shared(spark, sf_dir)
    mh = extended.minhash_pairs_shared(spark, sf_dir)
    assert extended.prefix_filter_pairs_shared(spark, sf_dir) is pp
    assert extended.minhash_pairs_shared(spark, sf_dir) is mh
    assert mh.storageLevel.useMemory and pp.storageLevel.useMemory
    cache.release_managed()
