"""Bloom-filter prefilter (operators/bloom.py): the no-false-negative
contract that makes prefilter + exact join ≡ plain join, the false-positive
rate staying near theory, and the probe staying a scan-side JVM filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from filmdatawarehouse_spark.operators.bloom import (
    bloom_prefilter,
    build_bloom,
)


def test_no_false_negatives(spark):
    """Every key that went into the filter must survive the prefilter —
    the property the registered oracle relies on."""
    keys = spark.range(0, 500).select((F.col("id") * 7919).alias("k"))
    words = build_bloom(keys, "k")
    fact = spark.range(0, 500).select((F.col("id") * 7919).alias("k"))
    assert bloom_prefilter(fact, words, "k").count() == 500


def test_false_positive_rate_near_theory(spark):
    """Probing 20k keys NOT in a 500-key filter: observed FP rate must be
    within 3x of (1 - e^(-kn/m))^k (loose bound, deterministic corpus).
    m comes from the ADAPTIVE sizing (r16: build_bloom sizes the bitmap
    to BITS_PER_KEY × keys instead of a fixed 2^17), read back from the
    word list — which also pins the encode/decode round-trip."""
    import math

    from filmdatawarehouse_spark.operators.bloom import K_HASHES

    n = 500
    keys = spark.range(0, n).select((F.col("id") * 7919).alias("k"))
    words = build_bloom(keys, "k")
    m_bits = len(words) * 64
    # adaptive sizing: smallest pow2 >= 10*500, i.e. 8192 bits
    assert m_bits == 8192, m_bits
    # disjoint probe set (offset beyond the build range)
    probe_n = 20_000
    probes = spark.range(0, probe_n).select(
        (F.col("id") * 7919 + 1).alias("k")
    )
    fp = bloom_prefilter(probes, words, "k").count()
    theory = (1 - math.exp(-K_HASHES * n / m_bits)) ** K_HASHES
    assert fp / probe_n <= max(3 * theory, 1e-3), (fp, theory)


def test_adaptive_m_clamps(spark):
    """Tiny key sets get the floor; the cap bounds the driver collect."""
    from filmdatawarehouse_spark.operators.bloom import M_BITS, M_BITS_FLOOR

    one = spark.range(0, 1).select(F.col("id").alias("k"))
    assert len(build_bloom(one, "k")) * 64 == M_BITS_FLOOR
    big = spark.range(0, 200_000).select(F.col("id").alias("k"))
    assert len(build_bloom(big, "k")) * 64 == M_BITS


def test_prefilter_is_scan_side_jvm(spark, sf_dir):
    """The probe must compile to a plain Filter over the scan — no
    shuffle introduced, no Python in the plan."""
    from filmdatawarehouse_spark.io.sources import read_table

    supp = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 5)
        .select("s_suppkey")
    )
    words = build_bloom(supp, "s_suppkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey")
    plan = bloom_prefilter(li, words, "l_suppkey")._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        bloom_prefilter(li, words, "l_suppkey")._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Python" not in plan
    assert "Filter" in tree
