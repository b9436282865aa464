"""operators/prefix.global_running_sum: equality with the single-window
reference under adversarial partitioning, and the prefix-filter join's
completeness against brute force on planted near-dup corpora."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from filmdatawarehouse_spark.operators.prefix import global_running_sum


def _reference_cumsum(df, value, order):
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("cum", F.sum(value).over(w))


def test_global_running_sum_matches_single_window(spark):
    """The distributed prefix sum must equal the (single-partition)
    window reference exactly — decimals, every row — regardless of the
    partition count it is given."""
    rows = [(i, str((i * 37 % 100) + 0.25)) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, v string").select(
        "k", F.col("v").cast("decimal(18,2)").alias("v")
    )
    order = [F.col("v").desc(), F.col("k")]
    want = {
        r["k"]: r["cum"]
        for r in _reference_cumsum(df, F.col("v"), order).collect()
    }
    for n_parts in (1, 3, 32, 97):
        got = {
            r["k"]: r["cum"]
            for r in global_running_sum(
                df, F.col("v"), order, "cum", n_partitions=n_parts
            ).collect()
        }
        assert got == want, n_parts


def test_global_running_sum_keeps_exact_decimal_offsets(spark):
    """Sub-cent scales must survive the offset round-trip (the r06 bug
    class: a fixed decimal(38,2) offset cast truncated scale-4 sums)."""
    rows = [(i, str(i + 0.0001)) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, v string").select(
        "k", F.col("v").cast("decimal(18,4)").alias("v")
    )
    order = [F.col("k")]
    out = global_running_sum(df, F.col("v"), order, "cum", n_partitions=7)
    total = out.agg(F.max("cum")).collect()[0][0]
    want = sum(Decimal(str(i + 0.0001)).quantize(Decimal("0.0001")) for i in range(100))
    assert total == want


def test_global_running_sum_total_col(spark):
    """total_col must equal SUM(value) OVER () exactly (decimal, every
    row the same value; NULL iff every value is NULL) — it is derived
    driver-side from the collected partition sums, so a drift here would
    silently skew every share-of-total consumer."""
    rows = [(i, str((i * 37 % 100) + 0.25)) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, v string").select(
        "k", F.col("v").cast("decimal(18,2)").alias("v")
    )
    out = global_running_sum(
        df, F.col("v"), [F.col("k")], "cum", n_partitions=7, total_col="tot"
    ).collect()
    want = sum(Decimal(str((i * 37 % 100) + 0.25)) for i in range(500))
    assert {r["tot"] for r in out} == {want}
    # all-NULL input: SQL SUM over () is NULL
    nulls = spark.createDataFrame(
        [(i, None) for i in range(20)], "k int, v string"
    ).select("k", F.col("v").cast("decimal(18,2)").alias("v"))
    out_n = global_running_sum(
        nulls, F.col("v"), [F.col("k")], "cum", n_partitions=3, total_col="tot"
    ).collect()
    assert {r["tot"] for r in out_n} == {None}


def test_prefix_filter_join_is_complete_vs_brute_force(spark, tmp_path):
    """Planted near-duplicates (Jaccard >= 0.7 on word 3-shingles) must
    ALL surface — the prefix filter is an exactness-preserving pruning,
    so the result must equal brute force over every pair, under any
    partitioning."""
    from itertools import combinations

    from filmdatawarehouse_spark.queries.extended import (
        PPJOIN_T_DEN,
        PPJOIN_T_NUM,
        q_text_prefix_filter_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, base),
        (1, base + " lambda"),  # near-dup of 0
        # one word replaced flips THREE 3-shingles: J = 5/11 ≈ 0.45,
        # correctly below the 0.7 bar — a true negative the filter must
        # also agree on
        (2, base.replace("gamma", "mu")),
        (3, "one two three four five six seven eight nine ten"),
        (4, "completely different words entirely here now today folks"),
        (5, base + " lambda"),  # exact dup of 1
    ]
    d = tmp_path / "docs_sf"
    spark.createDataFrame(docs, "doc_id long, text string").repartition(
        4
    ).write.parquet(str(d / "documents.parquet"))

    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in q_text_prefix_filter_pairs(spark, str(d)).collect()
    }

    def shingles(t):
        ws = t.split(" ")
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    want = set()
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        a, b = shingles(ta), shingles(tb)
        inter = len(a & b)
        union = len(a | b)
        if PPJOIN_T_DEN * inter >= PPJOIN_T_NUM * union:
            want.add((min(ia, ib), max(ia, ib)))

    assert got == want
    assert (0, 1) in want and (1, 5) in want
    assert (0, 2) not in want  # 3-shingle damage: J = 5/11 < 0.7


def test_prefix_filter_join_all_identical_worst_case(spark, tmp_path):
    """An all-identical corpus is the exact join's provable worst case —
    the OUTPUT is quadratic, so the only correct behavior is to return
    every pair. 12 identical docs → C(12,2) = 66 pairs, jaccard 1.0."""
    from filmdatawarehouse_spark.queries.extended import (
        q_text_prefix_filter_pairs,
    )

    docs = [(i, "alpha beta gamma delta epsilon zeta") for i in range(12)]
    d = tmp_path / "ident_sf"
    spark.createDataFrame(docs, "doc_id long, text string").repartition(
        3
    ).write.parquet(str(d / "documents.parquet"))
    rows = q_text_prefix_filter_pairs(spark, str(d)).collect()
    assert len(rows) == 66
    assert all(r.jaccard == 1.0 and r.n_inter == 4 for r in rows)


def test_prefix_filter_join_degenerate_docs(spark, tmp_path):
    """Sub-3-word and empty documents produce no shingles and must
    neither pair nor crash; a lone normal doc has no partner."""
    from filmdatawarehouse_spark.queries.extended import (
        q_text_prefix_filter_pairs,
    )

    docs = [(0, ""), (1, "one two"), (2, "a b c d e f g h")]
    d = tmp_path / "degen_sf"
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    assert q_text_prefix_filter_pairs(spark, str(d)).collect() == []


def test_global_running_sum_empty_and_single_row(spark):
    """Degenerate inputs: empty frame -> empty result (no crash on the
    empty offsets collect); single row -> cum == value."""
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "k int, v decimal(18,2)")
    assert (
        global_running_sum(empty, F.col("v"), [F.col("k")], "cum").collect()
        == []
    )
    one = spark.createDataFrame([(1, "7.25")], "k int, v string").select(
        "k", F.col("v").cast("decimal(18,2)").alias("v")
    )
    [row] = global_running_sum(one, F.col("v"), [F.col("k")], "cum").collect()
    assert str(row["cum"]) == "7.25"


def test_global_running_sum_all_null_partition(spark):
    """A contiguous order range whose values are all NULL sums to a NULL
    partition total; the offset builder must treat it as zero (matching
    the window sum, which skips NULLs) instead of raising TypeError."""
    from pyspark.sql import functions as F

    for null_pred in (
        lambda i: 40 <= i < 60,  # interior all-NULL range
        lambda i: i < 25,  # leading NULLs: cum must stay NULL until k=25
    ):
        rows = [
            (i, None if null_pred(i) else str(i + 0.5)) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "k int, v string").select(
            "k", F.col("v").cast("decimal(18,2)").alias("v")
        )
        out = global_running_sum(
            df, F.col("v"), [F.col("k")], "cum", n_partitions=5
        )
        want = {
            r["k"]: r["cum"]
            for r in _reference_cumsum(df, F.col("v"), [F.col("k")]).collect()
        }
        got = {r["k"]: r["cum"] for r in out.collect()}
        assert got == want


def test_abc_pareto_ties_partition_invariant(spark, tmp_path):
    """All-equal revenues are the worst tie case for a global cumsum: the
    (revenue DESC, partkey) total order must make the result identical
    across partition counts, with cum_share strictly increasing."""
    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.queries.relational import q_orders_abc_pareto

    rows = [(k % 40, 100.0, 0.0) for k in range(400)]  # 40 parts, equal rev
    d = tmp_path / "tie_sf"
    spark.createDataFrame(
        rows, "l_partkey long, l_extendedprice double, l_discount double"
    ).repartition(8).write.parquet(str(d / "lineitem.parquet"))

    base = None
    for _ in range(2):  # rangepartition sampling must not matter
        got = sorted(
            (r.l_partkey, r.cum_share, r.abc_class)
            for r in q_orders_abc_pareto(spark, str(d)).collect()
        )
        shares = [g[1] for g in got]
        assert shares == sorted(shares) and len(set(shares)) == len(shares)
        if base is None:
            base = got
        else:
            assert got == base
