"""Unit tests for individual operators: date encodings, fingerprints,
MinHash recall, SimHash, IVF recall vs the exact path."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from filmdatawarehouse_spark.io.sources import literal_rows, read_table
from filmdatawarehouse_spark.operators.dates import date_dimension, date_id, month_key
from filmdatawarehouse_spark.operators import dedup as dd
from filmdatawarehouse_spark.operators.similarity import cosine_topk, ivf_topk
from filmdatawarehouse_spark.operators.text import fingerprint

TS = datetime.datetime

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def test_date_encodings(spark):
    df = spark.createDataFrame(
        [(TS(2005, 12, 31, 23, 59, 59),), (TS(2006, 1, 1, 0, 0, 0),)], "ts timestamp"
    )
    out = df.select(
        date_id("ts").alias("d"), month_key("ts").alias("m")
    ).collect()
    assert (out[0].d, out[0].m) == (20051231, 20051201)
    assert (out[1].d, out[1].m) == (20060101, 20060101)


def test_date_dimension_bounds(spark):
    dd_ = date_dimension(spark, "2005-01-01", "2005-01-03")
    rows = sorted(r.date_id for r in dd_.collect())
    assert rows == [20050101, 20050102, 20050103]


def test_fingerprint_known_value(spark):
    # h("abc") = ((0*31+97)*31+98)*31+99 mod 1e9+7 = 96354 (matches DuckDB)
    df = spark.createDataFrame([("abc",)], "text string")
    assert df.select(fingerprint("text").alias("f")).first().f == 96354


def test_minhash_finds_planted_near_dup(spark):
    base = " ".join(f"w{i}" for i in range(60))
    edited = base.replace("w30", "x30")  # ~3 shingles differ of 58
    other = " ".join(f"z{i}" for i in range(60))
    docs = literal_rows(
        spark,
        [
            dict(doc_id=1, text=base),
            dict(doc_id=2, text=edited),
            dict(doc_id=3, text=other),
        ],
        DOC_SCHEMA,
    )
    pairs = {(r.doc_id_a, r.doc_id_b) for r in dd.minhash_dedup_pairs(docs, 0.8).collect()}
    assert pairs == {(1, 2)}


def test_exact_duplicate_has_jaccard_one(spark):
    text = " ".join(f"w{i}" for i in range(40))
    docs = literal_rows(
        spark, [dict(doc_id=1, text=text), dict(doc_id=2, text=text)], DOC_SCHEMA
    )
    rows = dd.minhash_dedup_pairs(docs, 0.99).collect()
    assert len(rows) == 1 and rows[0].jaccard == 1.0


def test_minhash_skips_shingleless_docs(spark):
    # a doc shorter than the shingle width has an empty shingle set; the
    # numpy signature stage must drop it (the old explode+groupBy shape did)
    # rather than emit NaN/empty signatures or crash the Arrow batch
    text = " ".join(f"w{i}" for i in range(40))
    docs = literal_rows(
        spark,
        [
            dict(doc_id=1, text=text),
            dict(doc_id=2, text=text),
            dict(doc_id=3, text="too short"),  # 2 tokens < 3-word shingle
        ],
        DOC_SCHEMA,
    )
    pairs = {(r.doc_id_a, r.doc_id_b) for r in dd.minhash_dedup_pairs(docs, 0.8).collect()}
    assert pairs == {(1, 2)}


def test_embedding_cosine_empty_candidate_set(spark):
    # an impossible threshold produces zero GEMM candidates; the localized
    # empty candidate frame must keep its schema through the re-score joins
    emb = literal_rows(
        spark,
        [
            dict(vec_id=1, embedding=[1.0, 0.0]),
            dict(vec_id=2, embedding=[0.0, 1.0]),
        ],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    out = dd.embedding_cosine_pairs(emb, threshold=0.99, dim=2)
    assert out.columns == ["vec_id_a", "vec_id_b", "cosine"]
    assert out.count() == 0


def test_simhash_identical_docs_distance_zero(spark):
    text = "the quick brown fox jumps over the lazy dog " * 5
    docs = literal_rows(
        spark, [dict(doc_id=1, text=text), dict(doc_id=2, text=text)], DOC_SCHEMA
    )
    rows = dd.simhash_pairs(docs, hamming_max=3).collect()
    assert len(rows) == 1 and rows[0].hamming == 0


def test_ivf_recall_against_exact(spark, sf_dir):
    """The approximate path must recover ≥ 90% of exact neighbors at default
    parameters — the same bar the similarity_ann_recall oracle certifies
    (recall measured, not assumed)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9
    assert all(q < 10 for q, _ in approx)


def test_ivf_plan_is_zero_shuffle_until_topk(spark, sf_dir):
    """The IVF scan must be a single mapInPandas pass — no window/shuffle for
    list assignment (round-1 VERDICT item 2) and no trailing distinct; the
    only exchange is the final per-query top-k over partial-top-k rows."""
    from tests.test_plan_hygiene import plan_of

    emb = read_table(spark, sf_dir, "embeddings")
    plan = plan_of(ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=5))
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") == 1
    assert tree.count("Exchange") == 1  # only the final top-k window
    assert "HashAggregate" not in tree  # no distinct pass


def test_hot_bucket_guard_bounds_candidates(spark):
    """A planted degenerate bucket (mass-duplicated boilerplate) must not
    produce B²/2 candidate rows when the cap is on — and the guard must be
    reported by hot_buckets (VERDICT round-1 item 4)."""
    text = "same boilerplate text repeated across the corpus " * 3
    docs = literal_rows(
        spark,
        [dict(doc_id=i, text=text) for i in range(40)],
        DOC_SCHEMA,
    )
    # uncapped: every pair of the 40 identical docs is a candidate
    assert dd.minhash_dedup_pairs(docs, 0.8, bucket_cap=None).count() == 40 * 39 // 2
    # capped below the bucket size: the degenerate bucket is excluded and the
    # candidate count is bounded (here: zero — all buckets are the hot one)
    assert dd.minhash_dedup_pairs(docs, 0.8, bucket_cap=10).count() == 0
    # the guard is auditable: every band's bucket holds all 40 docs
    shingled = dd.word_shingle_frame(docs)
    sigs = dd.minhash_signatures(shingled, F.col("shingles"), "doc_id")
    hot = dd.hot_buckets(
        sigs.select(
            "doc_id",
            F.posexplode(
                F.array(*[
                    F.md5(F.concat_ws(",", F.col(f"sig_{2*b}").cast("string"),
                                      F.col(f"sig_{2*b+1}").cast("string")))
                    for b in range(dd.NUM_PERM // dd.BAND_ROWS)
                ])
            ).alias("band", "bucket"),
        ),
        ["band", "bucket"],
        cap=10,
    ).collect()
    assert len(hot) == dd.NUM_PERM // dd.BAND_ROWS
    assert all(r.bucket_size == 40 for r in hot)
    # simhash: identical docs share every block -> all 4 block-buckets hot
    assert dd.simhash_pairs(docs, 3, bucket_cap=None).count() == 40 * 39 // 2
    assert dd.simhash_pairs(docs, 3, bucket_cap=10).count() == 0


def test_hot_bucket_guard_is_pay_as_you_go(spark):
    """When the caller-supplied corpus bound proves no bucket can exceed
    the cap, the census aggregation must vanish from the plan — and when
    the bound does NOT prove it, the guard must still fire."""
    text = "same boilerplate text repeated across the corpus " * 3
    docs = literal_rows(
        spark,
        [dict(doc_id=i, text=text) for i in range(40)],
        DOC_SCHEMA,
    )
    shingled = dd.word_shingle_frame(docs)
    sigs = dd.minhash_signatures(
        shingled, F.col("shingles"), "doc_id", keep_shingles=True
    )
    # bound 40 <= cap 64: guard provably idle -> no census aggregate on the
    # candidate side of the plan (join-side re-aggregation would show as an
    # extra Aggregate over the bucket frame)
    skipped = dd.lsh_candidate_pairs(sigs, bucket_cap=64, n_docs=40)
    assert "bucket_size" not in skipped._jdf.queryExecution().analyzed().toString()
    assert skipped.count() == 40 * 39 // 2
    # bound above the cap: the census must still drop the degenerate bucket
    assert (
        dd.minhash_dedup_pairs(docs, 0.8, bucket_cap=10, n_docs=40).count() == 0
    )


def test_dup_clusters_chain_and_singletons(spark):
    """Label propagation must cross multi-hop chains (1-2, 2-3, 3-4 → one
    cluster rooted at 1) and leave singletons alone."""
    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)], "doc_id_a long, doc_id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dd.dup_clusters(ids, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6}


def test_dup_clusters_raises_on_non_convergence(spark):
    """A diameter beyond max_iters must RAISE, not return half-propagated
    (wrong) labels (ADVICE r2): a 5-hop chain cannot converge in one
    round."""
    import pytest

    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_id_a long, doc_id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.dup_clusters(ids, chain, max_iters=1)
    # and a sufficient bound still converges to the chain root
    got = {
        r.doc_id: r.cluster_id
        for r in dd.dup_clusters(ids, chain, max_iters=10).collect()
    }
    assert got == {i: 1 for i in range(1, 7)}


def test_byte_ngram_signatures_short_doc_skipped(spark):
    """Docs shorter than the gram width produce no signature row (the
    explode-form semantic), and gram values are the bijective base-256
    encoding of the byte windows."""
    docs = literal_rows(
        spark,
        [dict(doc_id=1, text="abcd"), dict(doc_id=2, text="abcdef")],
        DOC_SCHEMA,
    )
    rows = {r.doc_id: r for r in dd.byte_ngram_signatures(docs, n=5).collect()}
    assert set(rows) == {2}  # doc 1 has only 4 bytes -> skipped
    # "abcde" and "bcdef" big-endian base-256
    expect = sorted(
        int.from_bytes(s.encode(), "big") for s in ("abcde", "bcdef")
    )
    assert sorted(rows[2].shingles) == expect


def test_embedding_ann_pairs_subset_of_exact(spark, sf_dir):
    """The IVF-bucketed dedup path shares the exact re-score, so its pairs
    must be a SUBSET of the exact pairs with identical cosines — only
    recall can differ, never precision."""
    from filmdatawarehouse_spark.io.sources import read_table as rt

    emb = rt(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_id_a, r.vec_id_b): r.cosine
        for r in dd.embedding_cosine_pairs(emb, 0.4).collect()
    }
    approx = {
        (r.vec_id_a, r.vec_id_b): r.cosine
        for r in dd.embedding_cosine_pairs_ann(emb, 0.4).collect()
    }
    assert set(approx) <= set(exact)
    assert all(approx[k] == exact[k] for k in approx)
    assert len(approx) >= 0.9 * len(exact)


def test_hash_split_stable_and_leakproof(spark, sf_dir):
    """Split assignment is a pure function of the key: identical across
    runs/partitionings, duplicate keys co-assigned, fractions roughly
    honored."""
    from filmdatawarehouse_spark.operators.sampling import hash_split

    docs = read_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(17), "doc_id").collect()
    }
    assert a == b  # layout-independent
    n = len(a)
    from collections import Counter

    frac = {k: v / n for k, v in Counter(a.values()).items()}
    assert 0.7 < frac["train"] < 0.9
    assert 0.05 < frac["val"] < 0.15
    assert 0.05 < frac["test"] < 0.15
    # duplicate keys land together: split depends only on the key value
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "doc_id long, v string")
    splits = {r.split for r in hash_split(dup, "doc_id").collect()}
    assert len(splits) == 1


def test_exact_dedup_distinct(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id int, v string")
    assert dd.exact_dedup(df).count() == 2
    assert dd.exact_dedup(df, ["v"]).count() == 2


def test_star_contraction_high_diameter_chain(spark):
    """A 300-node path graph: diameter-bound BSP label propagation must
    REFUSE at max_iters=20 (never return partial clusters), while
    star-contraction converges in O(log n) rounds with every node labeled
    by the component min."""
    import pytest as _pytest

    from filmdatawarehouse_spark.operators.dedup import (
        dup_clusters,
        star_contraction_clusters,
    )

    n = 300
    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    pairs = (
        spark.range(n - 1)
        .select(
            F.col("id").alias("doc_id_a"), (F.col("id") + 1).alias("doc_id_b")
        )
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(ids, pairs, max_iters=20).collect()

    got = {
        r.doc_id: r.cluster_id
        for r in star_contraction_clusters(ids, pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_star_contraction_matches_bsp_on_real_pairs(spark, sf_dir):
    """On the corpus's actual MinHash near-dup pair graph (low diameter),
    star-contraction and BSP must produce identical components, singletons
    included."""
    from filmdatawarehouse_spark.io.sources import read_table
    from filmdatawarehouse_spark.operators.dedup import (
        dup_clusters,
        minhash_dedup_pairs,
        star_contraction_clusters,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_dedup_pairs(docs).select("doc_id_a", "doc_id_b")
    ids = docs.select("doc_id")
    bsp = {r.doc_id: r.cluster_id for r in dup_clusters(ids, pairs).collect()}
    star = {
        r.doc_id: r.cluster_id
        for r in star_contraction_clusters(ids, pairs).collect()
    }
    assert star == bsp and len(star) > 0


def test_round5_text_queries_survive_degenerate_docs(spark, tmp_path):
    """Empty text, 1-word, 2-word, and NULL-text documents must flow
    through every round-5 text query without errors (slice-length-0,
    empty-split, and NULL-handling edges)."""
    import pyspark.sql.functions as F

    rows = [(1, ""), (2, "solo"), (3, "two words"), (4, None), (5, "a b c")]
    df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn(
            "n_chars", F.length(F.coalesce("text", F.lit(""))).cast("long")
        )
    )
    d = str(tmp_path / "degenerate_docs")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")

    from filmdatawarehouse_spark.queries.extended import (
        q_text_bigram_lm,
        q_text_containment_pairs,
        q_text_heavy_hitters,
        q_text_sparse_cosine_pairs,
        q_text_unigram_logprob,
    )

    assert q_text_bigram_lm(spark, d).count() == 0  # no bigram reaches c>=5
    assert q_text_sparse_cosine_pairs(spark, d).count() == 0
    assert q_text_containment_pairs(spark, d).count() == 0
    # heavy hitters: every token clears 1/64 of this tiny corpus
    assert q_text_heavy_hitters(spark, d).count() > 0
    # logprob drops only the NULL-text doc (split(NULL) explodes nothing)
    assert q_text_unigram_logprob(spark, d).count() == 4


def test_ivf_index_build_search_recall_and_pruning(spark, sf_dir, tmp_path):
    """r11 persisted IVF: search over the on-disk index must hold the
    same recall bar as the in-memory ivf_topk, and its collection read
    must be PARTITION-PRUNED to the probed lists (the I/O-skip that
    makes the persisted form the served-collection scale path)."""
    from filmdatawarehouse_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_search,
    )
    from tests.test_plan_hygiene import plan_of

    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    ivf_index_build(emb, idx)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    df = ivf_index_search(spark, idx, queries, k=5)
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "list_id" in plan
    approx = {(r.query_id, r.neighbor_id) for r in df.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9
    assert all(q < 10 for q, _ in approx)


def test_ivf_index_append_assigns_like_build(spark, sf_dir, tmp_path):
    """r11 persisted IVF: appending an increment must land every vector
    in exactly the list the stored centroids assign — bit-identical to
    having indexed the full collection with those centroids — inside
    the EXISTING list partitions (no new top-level dirs, no retrain)."""
    import os as _os

    from filmdatawarehouse_spark.operators.similarity import (
        _assign_lists,
        _centroids_of,
        ivf_index_append,
        ivf_index_build,
        ivf_index_vectors_path,
        ivf_index_version_dir,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)
    idx = str(tmp_path / "ivf")
    ivf_index_build(base, idx)
    ivf_index_append(delta, idx)
    vectors = ivf_index_vectors_path(spark, idx)
    lists_after = sorted(
        d for d in _os.listdir(vectors) if d.startswith("list_id=")
    )
    # appends land only in lists the stored centroids define (0..15)
    assert all(0 <= int(d.split("=")[1]) < 16 for d in lists_after)
    stored = {
        (r.vec_id, r.list_id)
        for r in spark.read.parquet(vectors).collect()
    }
    assert len(stored) == 500
    cents = _centroids_of(spark, ivf_index_version_dir(spark, idx))
    expect = {
        (r.vec_id, r.list_id)
        for r in _assign_lists(emb, cents, "vec_id", "embedding").collect()
    }
    assert stored == expect


def test_ivf_index_append_fragmentation_compacts_in_place(
    spark, sf_dir, tmp_path
):
    """r11 composition: the index's vectors table IS a hive-partitioned
    parquet table, so repeated ivf_index_append fragmentation is healed
    by io.maintenance.compact_partitions on list_id — same recall after,
    fewer files, untouched search semantics."""
    from filmdatawarehouse_spark.io import maintenance as mt
    from filmdatawarehouse_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_search,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    ivf_index_build(emb.filter(F.col("vec_id") < 200), idx)
    # ten small appends: the served-collection ingest pattern
    for lo in range(200, 500, 30):
        ivf_index_append(
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 30)
            ),
            idx,
        )
    from filmdatawarehouse_spark.operators.similarity import (
        ivf_index_vectors_path,
    )

    vectors = ivf_index_vectors_path(spark, idx)
    before = len(mt.list_data_files(spark, vectors))
    queries = emb.filter(F.col("vec_id") < 10)
    res_before = {
        (r.query_id, r.neighbor_id, round(r.cosine, 9))
        for r in ivf_index_search(spark, idx, queries, k=5).collect()
    }
    summary = mt.compact_partitions(
        spark, vectors, "list_id", target_bytes=1 << 30
    )
    assert summary["partitions"] >= 1
    after = len(mt.list_data_files(spark, vectors))
    assert after < before
    assert spark.read.parquet(vectors).count() == 500
    res_after = {
        (r.query_id, r.neighbor_id, round(r.cosine, 9))
        for r in ivf_index_search(spark, idx, queries, k=5).collect()
    }
    assert res_after == res_before
    # converged
    assert (
        mt.compact_partitions(
            spark, vectors, "list_id", target_bytes=1 << 30
        )["partitions"]
        == 0
    )


def test_ivf_index_rebuild_is_versioned_and_crash_safe(
    spark, sf_dir, tmp_path
):
    """r11 review: a rebuild writes a fresh version dir and commits via
    an atomic pointer flip — a crash mid-rebuild (partial version dir,
    pointer not flipped) leaves searches on the intact committed
    version, and the next successful build prunes the leftovers while
    RETAINING the immediately-previous version (keep-two, r12: a search
    that resolved the old pointer keeps reading intact files through
    one rebuild; only the build after that prunes them). Empty query
    sets return an empty frame, never a numpy stack crash."""
    import os as _os

    from filmdatawarehouse_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_search,
        ivf_index_version_dir,
        ivf_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    ivf_index_build(emb, idx)
    v1 = ivf_index_version_dir(spark, idx)
    queries = emb.filter(F.col("vec_id") < 5)
    res1 = {
        (r.query_id, r.neighbor_id)
        for r in ivf_index_search(spark, idx, queries, k=5).collect()
    }
    # simulate a rebuild crash: a partial version dir (centroids only,
    # no vectors, no pointer flip)
    _os.makedirs(f"{idx}/v-deadbeef/centroids")
    assert ivf_index_version_dir(spark, idx) == v1  # pointer untouched
    res_crash = {
        (r.query_id, r.neighbor_id)
        for r in ivf_index_search(spark, idx, queries, k=5).collect()
    }
    assert res_crash == res1  # served off the committed version
    # the next successful build prunes the partial leftover but RETAINS
    # v1 (keep-two): an in-flight search holding v1 still reads it whole
    ivf_index_build(emb, idx)
    v2 = ivf_index_version_dir(spark, idx)
    assert v2 != v1
    assert not _os.path.exists(f"{idx}/v-deadbeef")
    assert _os.path.exists(v1)
    # ... and the THIRD build retains v2 and finally prunes v1
    ivf_index_build(emb, idx)
    v3 = ivf_index_version_dir(spark, idx)
    assert v3 not in (v1, v2)
    assert _os.path.exists(v2)
    assert not _os.path.exists(v1)
    # empty query set: empty result with the contract schema, both paths
    none = emb.filter(F.col("vec_id") < 0)
    out = ivf_index_search(spark, idx, none, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    out2 = ivf_topk(emb, none, k=5)
    assert out2.count() == 0
    assert out2.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_ivf_append_racing_one_rebuild_lands_in_retained_version(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r12 (ADVICE): an append that resolved the pointer JUST BEFORE a
    rebuild commits must complete against its resolved version — the
    keep-two retention guarantees that dir still exists through one
    rebuild — and must not corrupt the newly committed current version.
    (Two rebuilds after resolution exceed the retention window; the
    module contract mandates single-writer for append-vs-rebuild.)"""
    import os as _os

    from filmdatawarehouse_spark.operators import similarity as sim

    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    sim.ivf_index_build(emb.filter(F.col("vec_id") < 200), idx)
    v1 = sim.ivf_index_version_dir(spark, idx)

    # pause the append after pointer resolution: pin the resolved dir,
    # then let a rebuild flip the pointer and prune
    monkeypatch.setattr(sim, "ivf_index_version_dir", lambda s, p: v1)
    sim.ivf_index_build(emb.filter(F.col("vec_id") < 300), idx)
    monkeypatch.undo()
    v2 = sim.ivf_index_version_dir(spark, idx)
    assert v2 != v1 and _os.path.exists(v1)  # keep-two retained v1

    with monkeypatch.context() as m:
        m.setattr(sim, "ivf_index_version_dir", lambda s, p: v1)
        sim.ivf_index_append(
            emb.filter(
                (F.col("vec_id") >= 300) & (F.col("vec_id") < 320)
            ),
            idx,
        )
    # the increment landed whole in the RETAINED resolved version ...
    assert spark.read.parquet(f"{v1}/vectors").count() == 220
    # ... and the committed current version is untouched by the race
    assert spark.read.parquet(f"{v2}/vectors").count() == 300
    res = sim.ivf_index_search(
        spark, idx, emb.filter(F.col("vec_id") < 3), k=3
    )
    assert res.count() == 9  # served index still consistent
