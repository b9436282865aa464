"""Unit tests for the corpus-curation operators (operators/curation.py):
decontamination, deterministic stratified sampling, sequence packing, PII
redaction. End-to-end oracle parity is covered by test_parity_queries; these
pin the edge-case semantics the oracle corpus doesn't exercise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filmdatawarehouse_spark.operators import curation as cu


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_flags_overlap_and_counts_distinct_grams(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    cand = _docs(
        spark,
        [
            # shares three distinct 5-grams with bench
            (1, "quick brown fox jumps over the lazy cat"),
            (2, "completely different words here with no overlap at all"),
            (3, "too short"),  # < n words -> zero grams, never contaminated
        ],
    )
    got = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in cu.decontaminate(cand, bench, n=5).collect()
    }
    assert got[1] == (3, 1)  # "quick..over", "brown..the", "fox..lazy"
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)
    assert set(got) == {1, 2, 3}  # every candidate reported, none dropped


def test_decontaminate_gram_sets_are_distinct_per_doc(spark):
    # repeated identical 5-gram in ONE candidate doc counts once
    bench = _docs(spark, [(100, "a b c d e")])
    cand = _docs(spark, [(1, "a b c d e x a b c d e")])
    [row] = cu.decontaminate(cand, bench, n=5).collect()
    assert row["n_hit_grams"] == 1


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_deterministic_and_growth_stable(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint, s string")
    keep = cu.stratified_sample(df, "s", {"a": 0.5, "b": 0.0}, key_col="k")
    first = {r["k"] for r in keep.collect()}
    # re-run identical; no RNG
    assert {r["k"] for r in keep.collect()} == first
    # stratum b fully dropped, stratum a roughly half kept
    assert all(k % 2 == 1 for k in first)
    assert 30 <= len(first) <= 70
    # growing the corpus never flips an existing decision
    grown = spark.createDataFrame(
        rows + [(i, "a") for i in range(200, 400)], "k bigint, s string"
    )
    kept_grown = {
        r["k"]
        for r in cu.stratified_sample(
            grown, "s", {"a": 0.5, "b": 0.0}, key_col="k"
        ).collect()
    }
    assert {k for k in kept_grown if k < 200} == first


def test_stratified_sample_default_rate(spark):
    df = spark.createDataFrame([(i, "zzz") for i in range(100)], "k bigint, s string")
    assert cu.stratified_sample(df, "s", {"a": 1.0}, key_col="k").count() == 0
    assert (
        cu.stratified_sample(df, "s", {"a": 0.0}, key_col="k", default_rate=1.0).count()
        == 100
    )


def test_stratified_sample_is_shuffle_free(spark):
    df = spark.createDataFrame([(i, "a") for i in range(10)], "k bigint, s string")
    plan = cu.stratified_sample(df, "s", {"a": 0.5}, key_col="k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------


def test_weighted_sample_boundaries_and_growth_stable(spark):
    rows = [(i, w) for i, w in enumerate([0, -5, 1024, 2048, None] + [128] * 400)]
    df = spark.createDataFrame(rows, "k bigint, w bigint")
    keep = cu.weighted_sample(df, "w", key_col="k", denom=1024)
    first = {r["k"] for r in keep.collect()}
    # deterministic — identical re-run
    assert {r["k"] for r in keep.collect()} == first
    # weight <= 0 can never be drawn; weight >= denom always is; NULL
    # weight is 0, NOT full-denom (least/greatest skip nulls — unguarded,
    # a NULL weight would sample with probability 1)
    assert 0 not in first and 1 not in first and 4 not in first
    assert 2 in first and 3 in first
    # weight 128/1024 = 12.5% keep rate on the 400-row bulk
    bulk = [k for k in first if k >= 4]
    assert 20 <= len(bulk) <= 85
    # growing the corpus never flips an existing decision
    grown = spark.createDataFrame(
        rows + [(i, 128) for i in range(500, 900)], "k bigint, w bigint"
    )
    kept_grown = {
        r["k"]
        for r in cu.weighted_sample(grown, "w", key_col="k", denom=1024).collect()
    }
    assert {k for k in kept_grown if k < 500} == first


def test_weighted_sample_is_shuffle_free_and_integer_only(spark):
    df = spark.createDataFrame([(i, 100) for i in range(10)], "k bigint, w bigint")
    q = cu.weighted_sample(df, "w", key_col="k")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the keep decision is exact integer arithmetic — no float casts
    assert "as double" not in plan.lower()


def test_weighted_sample_matches_python_md5_reference(spark):
    """Third-engine check: the keep set equals a hashlib.md5 reference of
    the exact integer inequality, independent of both Spark and DuckDB —
    pins the draw recipe (salt, 8 hex digits, u*D < w*2^32), not just
    cross-engine agreement."""
    import hashlib

    rows = [(k, (k * 37) % 1500 - 20) for k in range(300)]
    df = spark.createDataFrame(rows, "k bigint, w bigint")
    got = {r["k"] for r in cu.weighted_sample(df, "w", key_col="k", denom=1024).collect()}
    expect = set()
    for k, w in rows:
        u = int(hashlib.md5(f"{cu.WEIGHTED_SALT}{k}".encode()).hexdigest()[:8], 16)
        wc = max(0, min(w, 1024))
        if u * 1024 < wc * (1 << 32):
            expect.add(k)
    assert got == expect and 0 < len(expect) < 300


def test_weighted_sample_rejects_bad_denom(spark):
    df = spark.createDataFrame([(1, 1)], "k bigint, w bigint")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cu.weighted_sample(df, "w", key_col="k", denom=0)
    with _pytest.raises(ValueError):
        cu.weighted_sample(df, "w", key_col="k", denom=(1 << 20) + 1)


def test_weighted_hash_bits_bound_enforced_without_assert():
    """Review r09: the bits+20≤62 overflow bound is enforced by a real
    raise (import-time call of _check_weighted_hash_bits), not a bare
    assert that `python -O` strips. The module constant passes; widths
    that break hex alignment or the int64 bound raise."""
    import pytest as _pytest

    assert cu._check_weighted_hash_bits(cu.WEIGHTED_HASH_BITS) == 32
    for bad in (30, 44, 0, -4):
        with _pytest.raises(RuntimeError):
            cu._check_weighted_hash_bits(bad)


# ---------------------------------------------------------------------------
# pack_documents
# ---------------------------------------------------------------------------


def test_pack_documents_offsets_and_chunks(spark):
    # one shard (n_shards=1) -> a single running offset in doc_id order
    docs = _docs(
        spark,
        [
            (1, "w1 w2 w3"),  # 3 tokens, start 0
            (2, "x1 x2"),  # 2 tokens, start 3
            (3, ""),  # 0 tokens -> dropped
            (4, "y1 y2 y3 y4"),  # 4 tokens, start 5
        ],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in cu.pack_documents(docs, window=4, n_shards=1).collect()
    }
    assert 3 not in got
    assert (got[1]["start_tok"], got[1]["chunk_first"], got[1]["chunk_last"]) == (0, 0, 0)
    assert (got[2]["start_tok"], got[2]["chunk_first"], got[2]["chunk_last"]) == (3, 0, 1)
    # doc 2 straddles the window=4 boundary (tokens 3..4)
    assert (got[4]["start_tok"], got[4]["chunk_first"], got[4]["chunk_last"]) == (5, 1, 2)


def test_pack_documents_shards_are_independent(spark):
    docs = _docs(spark, [(i, "t1 t2") for i in range(1, 9)])
    out = cu.pack_documents(docs, window=4, n_shards=2).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r["start_tok"])
    # each shard's offsets restart at 0 and advance by 2
    assert by_shard == {0: [0, 2, 4, 6], 1: [0, 2, 4, 6]}


def test_pack_documents_window_is_partitioned(spark):
    docs = _docs(spark, [(i, "a b") for i in range(1, 5)])
    plan = (
        cu.pack_documents(docs, window=4, n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "No Partition Defined" not in plan


# ---------------------------------------------------------------------------
# redact_pii
# ---------------------------------------------------------------------------


def test_redact_pii_counts_and_scrubs(spark):
    docs = _docs(
        spark,
        [
            (
                1,
                "mail a.user+x@site.example.org and b@c.io ip 10.0.0.7 "
                "call +1555-0100 done",
            ),
            (2, "nothing sensitive here"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in cu.redact_pii(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (2, 1, 1)
    clean = got[1]["clean_text"]
    assert "<EMAIL>" in clean and "<IP>" in clean and "<PHONE>" in clean
    assert "@" not in clean and "10.0.0.7" not in clean and "+1555" not in clean
    assert got[2]["clean_text"] == "nothing sensitive here"
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 0, 0)


def test_redact_pii_staged_counts_no_double_count(spark):
    # the IP-ish digits inside an email must not count as an IP once the
    # email is stripped first
    docs = _docs(spark, [(1, "user@10.0.0.7.example.com says hi")])
    [row] = cu.redact_pii(docs).collect()
    assert row["n_emails"] == 1
    assert row["n_ips"] == 0


# ---------------------------------------------------------------------------
# balanced data mixing
# ---------------------------------------------------------------------------


def test_balanced_mix_rates_are_exact_integer_ppb(spark):
    """The smallest group rates exactly PPB (keep all); larger groups get
    floor((target*PPB)/total) — pure int64, no float anywhere."""
    df = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 100), ("b", 3, 50), ("c", 4, 0)],
        "g string, k long, w long",
    )
    rows = {
        r.g: (r.docs_total, r.tokens_total, r.rate_ppb)
        for r in cu.balanced_mix_rates(df, "g", "w").collect()
    }
    # target = min(total) = 0 (group c) -> a and b rate 0, c keeps all
    assert rows == {
        "a": (2, 200, 0),
        "b": (1, 50, 0),
        "c": (1, 0, 1_000_000_000),
    }
    pos = df.filter("w > 0")
    rows = {
        r.g: r.rate_ppb
        for r in cu.balanced_mix_rates(pos, "g", "w").collect()
    }
    assert rows == {"a": 250_000_000, "b": 1_000_000_000}


def test_balanced_mix_filter_balances_and_is_growth_stable(spark):
    """End-to-end: every group's kept weight lands near the smallest
    group's total, and adding rows never flips an existing decision
    (the md5-draw stability contract shared with weighted_sample)."""
    rows = [("big", i, 10) for i in range(2000)] + [
        ("small", 10_000 + i, 10) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, k long, w long")
    rates = cu.balanced_mix_rates(df, "g", "w")
    kept = cu.balanced_mix_filter(df, rates, "g", "k")
    by_g = {
        r.g: r.s
        for r in kept.groupBy("g").agg(F.sum("w").alias("s")).collect()
    }
    assert by_g["small"] == 2000  # rate PPB: kept in full
    # big downsampled to ~2000 (binomial around n*p; wide bound)
    assert 1200 <= by_g["big"] <= 2800
    # growth stability: doubling the big group must not flip any
    # previously-kept key of the ORIGINAL corpus at the same rates
    grown = spark.createDataFrame(
        rows + [("big", 50_000 + i, 10) for i in range(2000)],
        "g string, k long, w long",
    )
    kept_again = {
        r.k
        for r in cu.balanced_mix_filter(grown, rates, "g", "k")
        .filter("k < 50000")
        .collect()
    }
    assert kept_again == {r.k for r in kept.collect()}


def test_balanced_mix_rejects_reserved_columns(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a", 1, 1)], "g string, _tot long, w long")
    with _pytest.raises(ValueError, match="_tot"):
        cu.balanced_mix_rates(df, "g", "w")


def test_balanced_mix_filter_plan_is_broadcast_and_shuffle_free(spark):
    """The keep-filter must probe a BroadcastHashJoin — the corpus side
    is never exchanged (the property that makes the mix a scan-rate
    operator at 100 TB)."""
    df = spark.createDataFrame(
        [("a", 1, 5), ("b", 2, 3)], "g string, k long, w long"
    )
    rates = cu.balanced_mix_rates(df, "g", "w")
    plan = (
        cu.balanced_mix_filter(df, rates, "g", "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    head = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in head, plan


def test_balanced_mix_filter_matches_python_md5_reference(spark):
    """Third-engine check (the weighted_sample precedent): the keep set
    equals a hashlib.md5 replay of the exact integer inequality,
    independent of both Spark and DuckDB — pins the draw recipe (salt,
    8 hex digits, u*PPB < rate*2^32), not just cross-engine agreement."""
    import hashlib

    rows = [(f"g{i % 3}", i, (i * 13) % 50 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, k long, w long")
    rates_df = cu.balanced_mix_rates(df, "g", "w")
    rates = {r.g: r.rate_ppb for r in rates_df.collect()}
    got = {
        r.k for r in cu.balanced_mix_filter(df, rates_df, "g", "k").collect()
    }
    expect = set()
    for g, k, _ in rows:
        u = int(
            hashlib.md5(f"{cu.MIX_SALT}{k}".encode()).hexdigest()[:8], 16
        )
        if u * cu.MIX_PPB < rates[g] * (1 << 32):
            expect.add(k)
    assert got == expect and 0 < len(expect) < 400


def test_temperature_mix_rates_exact_integer_contract(spark):
    """r11 (growth policy: operator + pytest oracle, no driver row):
    temperature rates are exact bigint functions of the group totals —
    alpha=0 reproduces balanced_mix_rates bit-for-bit on positive
    corpora, alpha=1 keeps everything, and every rate equals an
    independent Python bigint replay of iroot(PPB^q·target^p // tot^p, q)."""
    from fractions import Fraction

    rows = (
        [("en", i, 10) for i in range(1000)]
        + [("fr", 10_000 + i, 10) for i in range(100)]
        + [("sw", 20_000 + i, 10) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "g string, k long, w long")

    balanced = {
        r.g: r.rate_ppb for r in cu.balanced_mix_rates(df, "g", "w").collect()
    }
    t0 = {
        r.g: r.rate_ppb
        for r in cu.temperature_mix_rates(df, "g", "w", 0).collect()
    }
    assert t0 == balanced

    t1 = {
        r.g: r.rate_ppb
        for r in cu.temperature_mix_rates(df, "g", "w", 1).collect()
    }
    assert t1 == {"en": cu.MIX_PPB, "fr": cu.MIX_PPB, "sw": cu.MIX_PPB}

    totals = {"en": 10_000, "fr": 1_000, "sw": 100}
    for alpha in ("0.3", "1/2", Fraction(3, 4)):
        e = 1 - Fraction(alpha)
        p, q = e.numerator, e.denominator
        got = {
            r.g: r.rate_ppb
            for r in cu.temperature_mix_rates(df, "g", "w", alpha).collect()
        }
        expect = {
            g: min(
                cu.MIX_PPB,
                cu._iroot(cu.MIX_PPB**q * 100**p // tot**p, q),
            )
            for g, tot in totals.items()
        }
        assert got == expect, alpha
        assert got["sw"] == cu.MIX_PPB  # smallest group keeps all
    # monotone: higher alpha keeps more of the big group
    seq = [
        {
            r.g: r.rate_ppb
            for r in cu.temperature_mix_rates(df, "g", "w", a).collect()
        }["en"]
        for a in (0, "0.3", "1/2", "0.7", 1)
    ]
    assert seq == sorted(seq) and len(set(seq)) == 5


def test_temperature_mix_rejects_floats_and_bad_alpha(spark):
    import pytest

    df = spark.createDataFrame([("a", 1, 5)], "g string, k long, w long")
    with pytest.raises(ValueError, match="float"):
        cu.temperature_mix_rates(df, "g", "w", 0.3)
    with pytest.raises(ValueError, match="alpha"):
        cu.temperature_mix_rates(df, "g", "w", "3/2")


def test_temperature_mix_zero_weight_group_keeps_all_without_zeroing(
    spark,
):
    """A zero-weight group rates PPB and is EXCLUDED from the target —
    unlike balanced_mix_rates' documented min-includes-zero corner, a
    dead group must not zero every live group's budget."""
    df = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 100), ("b", 3, 50), ("c", 4, 0)],
        "g string, k long, w long",
    )
    got = {
        r.g: r.rate_ppb
        for r in cu.temperature_mix_rates(df, "g", "w", 0).collect()
    }
    assert got == {
        "a": 250_000_000,
        "b": cu.MIX_PPB,
        "c": cu.MIX_PPB,
    }


def test_temperature_mix_end_to_end_through_balanced_filter(spark):
    """Applying temperature rates through balanced_mix_filter yields
    kept weights near tot^alpha scaling: big-group kept weight ≈
    target^(1-alpha) · tot^alpha, within sampling noise."""
    rows = [("big", i, 10) for i in range(4000)] + [
        ("small", 100_000 + i, 10) for i in range(250)
    ]
    df = spark.createDataFrame(rows, "g string, k long, w long")
    rates = cu.temperature_mix_rates(df, "g", "w", "1/2")
    kept = cu.balanced_mix_filter(df, rates, "g", "k")
    by_g = {
        r.g: r.kept
        for r in kept.groupBy("g").agg(F.sum("w").alias("kept")).collect()
    }
    assert by_g["small"] == 2500  # keep-all
    # expected big kept weight = 40000 * sqrt(2500/40000) = 10000
    assert abs(by_g["big"] - 10_000) / 10_000 < 0.15


def test_iroot_is_exact_floor_root():
    import math

    for n in [0, 1, 7, 8, 9, 10**18, 10**27 + 12345, 2**200 - 1]:
        for q in [1, 2, 3, 5, 10]:
            r = cu._iroot(n, q)
            assert r**q <= n < (r + 1) ** q, (n, q, r)
    assert cu._iroot(10**18, 2) == 10**9
    assert math.isqrt(10**27 + 12345) == cu._iroot(10**27 + 12345, 2)


def test_temperature_mix_rejects_huge_denominator(spark):
    """r11 review: an unbounded exponent denominator ('0.333333' ->
    q=10^6) would cost multi-megabit bigints on the driver; refuse."""
    import pytest

    df = spark.createDataFrame([("a", 1, 5)], "g string, k long, w long")
    with pytest.raises(ValueError, match="denominator"):
        cu.temperature_mix_rates(df, "g", "w", "0.333333")
    # a legitimate small rational for the same temperature works
    assert cu.temperature_mix_rates(df, "g", "w", "1/3").count() == 1
