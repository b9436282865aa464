"""The DQ checks must COUNT planted violations, not rubber-stamp (the
corpus-level query legitimately all-passes, so this fixture is the proof
the machinery fires)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from filmdatawarehouse_spark.io.sources import literal_rows
from filmdatawarehouse_spark.operators import quality as q

CHILD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("fk", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ]
)
PARENT = T.StructType([T.StructField("pk", T.LongType())])


def _frames(spark):
    child = literal_rows(
        spark,
        [
            {"id": 1, "fk": 10, "amount": 5.0},
            {"id": 1, "fk": 10, "amount": 5.0},   # dup id (1 extra row)
            {"id": 1, "fk": 11, "amount": -2.0},  # dup id again + negative
            {"id": 2, "fk": 99, "amount": 3.0},   # orphan fk
            {"id": 3, "fk": None, "amount": None},  # null fk (not an FK
            # violation by contract), null amount (range violation: unknown
            # is not a pass)
        ],
        CHILD,
    )
    parent = literal_rows(spark, [{"pk": 10}, {"pk": 11}], PARENT)
    return child, parent


def test_checks_count_planted_violations(spark):
    child, parent = _frames(spark)
    report = {
        r.check_name: (r.n_violations, r.passed)
        for r in q.run_checks(
            [
                q.check_unique(child, ["id"], "id_unique"),
                q.check_not_null(child, "amount", "amount_not_null"),
                q.check_range(child, F.col("amount") > 0, "amount_positive"),
                q.check_foreign_key(child, "fk", parent, "pk", "fk_valid"),
            ]
        ).collect()
    }
    assert report == {
        "id_unique": (2, 0),        # three rows share id=1 -> 2 extras
        "amount_not_null": (1, 0),  # one null amount
        "amount_positive": (2, 0),  # -2.0 and NULL both violate
        "fk_valid": (1, 0),         # fk=99 has no parent; NULL fk exempt
    }


def test_clean_frame_passes(spark):
    child, parent = _frames(spark)
    clean = child.filter(F.col("id") > 1).filter(F.col("fk").isin(10, 11))
    report = q.run_checks(
        [
            q.check_unique(clean, ["id"], "id_unique"),
            q.check_foreign_key(clean, "fk", parent, "pk", "fk_valid"),
        ]
    ).collect()
    assert all(r.passed == 1 and r.n_violations == 0 for r in report)


def test_run_checks_empty_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        q.run_checks([])


def test_accepted_values_counts_outsiders(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("status", T.StringType()),
        ]
    )
    rows = [
        {"k": 1, "status": "OPEN"},
        {"k": 2, "status": "CLOSED"},
        {"k": 3, "status": "BOGUS"},   # outside the set
        {"k": 4, "status": None},      # NULL counts as violation
    ]
    df = literal_rows(spark, rows, schema)
    [r] = q.check_accepted_values(
        df, "status", ["OPEN", "CLOSED"], "status_domain"
    ).collect()
    assert (r.check_name, r.n_violations, r.passed) == ("status_domain", 2, 0)


def test_freshness_passes_and_fails_on_age(spark):
    import datetime

    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    rows = [
        {"ts": datetime.datetime(2024, 1, 1, 10, 0)},
        {"ts": datetime.datetime(2024, 1, 1, 12, 0)},  # max
    ]
    df = literal_rows(spark, rows, schema)
    fresh = q.check_freshness(
        df, "ts", 3600, "2024-01-01 12:30:00", "feed_fresh"
    ).collect()[0]
    assert (fresh.n_violations, fresh.passed) == (0, 1)
    stale = q.check_freshness(
        df, "ts", 3600, "2024-01-01 14:00:00", "feed_fresh"
    ).collect()[0]
    assert (stale.n_violations, stale.passed) == (1, 0)
    # empty table = no freshness at all
    empty = q.check_freshness(
        df.filter(F.lit(False)), "ts", 3600, "2024-01-01 12:30:00", "feed_fresh"
    ).collect()[0]
    assert (empty.n_violations, empty.passed) == (1, 0)


DOCS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_bigram_perplexity_matches_python_reference(spark):
    """r11 model-based quality gate: per-doc perplexity under a bigram
    LM equals an independent math.log replay (floor backoff included);
    a <2-token doc scores NULL, never a pretended number."""
    import math

    from filmdatawarehouse_spark.operators.text import bigram_perplexity

    lm = spark.createDataFrame(
        [
            ("the", "cat", 0.5),
            ("cat", "sat", 0.25),
            ("the", "dog", 0.5),
        ],
        "w1 string, w2 string, cond_p double",
    )
    docs = literal_rows(
        spark,
        [
            dict(doc_id=1, text="the cat sat"),        # both bigrams known
            dict(doc_id=2, text="the dog barks"),      # one known, one floor
            dict(doc_id=3, text="zebra"),               # no bigrams -> NULL
            dict(doc_id=4, text="qq ww ee"),            # all floor
        ],
        DOCS,
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob, r.perplexity)
        for r in bigram_perplexity(docs, lm, floor_p=1e-7).collect()
    }
    floor = math.log(1e-7)

    def expect(lps):
        avg = sum(lps) / len(lps)
        return (len(lps), avg, math.exp(-avg))

    e1 = expect([math.log(0.5), math.log(0.25)])
    e2 = expect([math.log(0.5), floor])
    e4 = expect([floor, floor])
    for doc, e in [(1, e1), (2, e2), (4, e4)]:
        n, avg, ppl = got[doc]
        assert n == e[0]
        assert abs(avg - e[1]) < 1e-12
        assert abs(ppl - e[2]) / e[2] < 1e-12
    assert got[3] == (0, None, None)
    # the well-modeled doc is less perplexing than the garbled one
    assert got[1][2] < got[4][2]


def test_bigram_perplexity_plan_broadcasts_lm_single_exchange(spark):
    """The LM join must broadcast (an LM table is top-K-bounded) and the
    plan's only exchange is the per-doc aggregation — the shape that
    keeps scoring a scan-rate operator at corpus scale."""
    from filmdatawarehouse_spark.operators.text import bigram_perplexity

    lm = spark.createDataFrame(
        [("a", "b", 0.5)], "w1 string, w2 string, cond_p double"
    )
    docs = literal_rows(
        spark, [dict(doc_id=1, text="a b c")], DOCS
    )
    plan = (
        bigram_perplexity(docs, lm)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("\n\n")[0]
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan


def test_perplexity_buckets_head_middle_tail(spark):
    """CCNet split: quantile edges route docs to head/middle/tail,
    NULL-scored docs to their own bucket; empty-score corpora don't
    crash on NULL quantiles."""
    from filmdatawarehouse_spark.operators.text import perplexity_buckets

    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)] + [(99, None)],
        "doc_id long, perplexity double",
    )
    got = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(scored, head=0.3, tail=0.3).collect()
    }
    assert got[99] == "unscored"
    assert got[1] == "head" and got[10] == "tail"
    buckets = [got[i] for i in range(1, 11)]
    assert buckets == sorted(
        buckets, key=["head", "middle", "tail"].index
    )  # monotone in perplexity
    assert {"head", "middle", "tail"} <= set(buckets)
    # all-NULL corpus: everything unscored, no crash
    nulls = spark.createDataFrame(
        [(1, None)], "doc_id long, perplexity double"
    )
    assert perplexity_buckets(nulls).first().ppl_bucket == "unscored"
    import pytest

    with pytest.raises(ValueError, match="head"):
        perplexity_buckets(scored, head=0.6, tail=0.6)
