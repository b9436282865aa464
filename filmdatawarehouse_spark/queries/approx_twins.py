"""Certified approximate twins of the exact percentile / distinct-count
queries — the 100 TB swap path, made a hash-gated contract instead of a
docstring promise.

`skew_profile_custkey` and `docs_mad_outliers` run EXACT `percentile` /
`median`, which buffers each group's values on the aggregating task —
certification-grade at test SF, a non-starter past ~10⁸ values per group.
Their docstrings have always said "swap `percentile_approx` at corpus
scale"; these twins CERTIFY that swap the same way `similarity_ann_recall`
certifies the IVF path:

- the approximate aggregate runs next to its exact twin IN-ENGINE;
- the emitted row carries the EXACT values (hash-pinned by the DuckDB
  oracle) plus ok-flags that the sketch met its contract;
- the oracle pins the flags at 1, so a sketch-quality regression fails the
  driver's value-hash gate — approximate values themselves are engine-
  specific and never compared directly.

For percentiles the contract is the sketch's own published guarantee, not
an ad-hoc value tolerance: Spark's `approx_percentile` (Greenwald-Khanna
style) returns a value whose RANK is within ``eps·N`` of ``p·N`` for
``eps = 1/accuracy``. The gate therefore counts, duplicate-safely, where
the returned value actually ranks — a value ``v`` occupies rank interval
``[#{x < v} + 1, #{x <= v}]`` — and checks that interval intersects
``[floor((p-eps)·N) - 1, ceil((p+eps)·N) + 1]`` (±1 slack for the two
engines' rank-rounding conventions). This holds for ANY data distribution,
unlike a relative value tolerance (a flat region makes values hyper-stable;
a gap at the quantile makes them jumpy — rank is what the sketch promises).

For distinct counts HyperLogLog++ has only a probabilistic (rsd) bound, so
the gate is the same relative-error tolerance `sketch_accuracy` certifies
(rsd 0.01 sketch against a 5× tolerance — a broken sketch is off by far
more; at these cardinalities HLL++ runs in its sparse, near-exact regime).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.queries.registry import Entry

APPROX_TWIN_QUERIES: dict[str, Entry] = {}
ORACLES: dict[str, str] = {}

PCTL_ACCURACY = 10_000  # approx_percentile knob; rank error eps = 1/accuracy
PCTL_EPS = 1.0 / PCTL_ACCURACY
DISTINCT_RSD = 0.01  # HLL++ target relative standard deviation
DISTINCT_TOL = 0.05  # certified max relative error on this corpus


def _rank_ok(n_le: Column, n_lt: Column, n: Column, p: float) -> Column:
    """1 iff the approx value's rank interval [n_lt+1, n_le] intersects the
    sketch-guaranteed window around p·n (±1 slack for rank-rounding)."""
    lo = F.floor((F.lit(p) - F.lit(PCTL_EPS)) * n) - F.lit(1)
    hi = F.ceil((F.lit(p) + F.lit(PCTL_EPS)) * n) + F.lit(1)
    return ((n_le >= lo) & ((n_lt + F.lit(1)) <= hi)).cast("int")


# --------------------------------------------------------------------------
# skew_profile_custkey_approx
# --------------------------------------------------------------------------


def q_skew_profile_custkey_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Certified-approx twin of `skew_profile_custkey`'s distribution
    stats: the group-size p50/p99 via `approx_percentile` instead of exact
    `percentile`, rank-gated against the exact frame (module docstring has
    the contract). Emits one row — exact n_keys / n_rows / p50 / p99
    (hash-pinned) plus the two rank-ok flags.

    Scale shape: same key-sized counts frame as the exact twin; the gate
    adds ONE more aggregate over that frame (never the base table) with
    the 1-row stats broadcast back. At 10⁸+ keys this is the profile you
    can actually run — the sketch is mergeable map-side state, nothing
    buffers a group.
    """
    from filmdatawarehouse_spark.operators.cache import managed_persist

    o = read_table(spark, sf_dir, "orders").select("o_custkey")
    # persisted: the key-sized counts frame feeds the stats aggregate AND
    # the rank-gate aggregate (same discipline as the exact twin)
    counts = managed_persist(
        o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.expr("percentile(cnt, 0.5)").alias("p50_e"),
        F.expr("percentile(cnt, 0.99)").alias("p99_e"),
        F.percentile_approx("cnt", 0.5, PCTL_ACCURACY).alias("p50_a"),
        F.percentile_approx("cnt", 0.99, PCTL_ACCURACY).alias("p99_a"),
    )
    gates = counts.crossJoin(F.broadcast(stats)).agg(
        F.sum((F.col("cnt") <= F.col("p50_a")).cast("bigint")).alias(
            "le_p50"
        ),
        F.sum((F.col("cnt") < F.col("p50_a")).cast("bigint")).alias("lt_p50"),
        F.sum((F.col("cnt") <= F.col("p99_a")).cast("bigint")).alias(
            "le_p99"
        ),
        F.sum((F.col("cnt") < F.col("p99_a")).cast("bigint")).alias("lt_p99"),
    )
    n = F.col("n_keys")
    return stats.crossJoin(gates).select(
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round("p50_e", 9).alias("p50_group"),
        F.round("p99_e", 9).alias("p99_group"),
        _rank_ok(F.col("le_p50"), F.col("lt_p50"), n, 0.5).alias("p50_ok"),
        _rank_ok(F.col("le_p99"), F.col("lt_p99"), n, 0.99).alias("p99_ok"),
    )


ORACLES["skew_profile_custkey_approx"] = """
    WITH counts AS (
      SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*)::BIGINT AS n_keys,
           SUM(cnt)::BIGINT AS n_rows,
           round(quantile_cont(cnt, 0.5), 9) AS p50_group,
           round(quantile_cont(cnt, 0.99), 9) AS p99_group,
           1 AS p50_ok,
           1 AS p99_ok
    FROM counts
"""


# --------------------------------------------------------------------------
# docs_mad_outliers_approx
# --------------------------------------------------------------------------


def q_docs_mad_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified-approx twin of `docs_mad_outliers`' per-source robust
    stats: median and MAD via `approx_percentile`, each rank-gated per
    source against the exact values (module docstring has the contract).
    Emits one row per source — exact n_docs / median / MAD (hash-pinned)
    plus the two rank-ok flags. The MAD gate runs on the APPROX-deviation
    distribution (|x − approx_median|) — exactly the numbers the
    100 TB pipeline would threshold on, so the certified object is the
    swap path itself, not a hybrid.

    Scale shape: group count is |sources| (tiny), so every join-back is a
    broadcast and the corpus is scanned three times with nothing buffered
    per group — vs the exact twin, which ships each source's full value
    vector to one task twice.
    """
    from filmdatawarehouse_spark.operators.cache import managed_persist

    # persisted: the 2-column projection feeds s1 AND the deviation
    # frame; the deviation frame feeds s2, the mad-rank pass, and would
    # otherwise re-derive its join subtree per consumer (plan-audited
    # r08: 7 document scans without these two persists, 1 with)
    d = managed_persist(
        read_table(spark, sf_dir, "documents").select("source", "n_chars")
    )
    s1 = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("percentile(n_chars, 0.5)").alias("med_e"),
        F.percentile_approx("n_chars", 0.5, PCTL_ACCURACY).alias("med_a"),
    )
    dev = managed_persist(
        d.join(F.broadcast(s1), "source")
        .withColumn(
            "adev_e", F.abs(F.col("n_chars").cast("double") - F.col("med_e"))
        )
        .withColumn(
            "adev_a",
            F.abs(
                F.col("n_chars").cast("double") - F.col("med_a").cast("double")
            ),
        )
    )
    s2 = dev.groupBy("source").agg(
        F.expr("percentile(adev_e, 0.5)").alias("mad_e"),
        F.percentile_approx("adev_a", 0.5, PCTL_ACCURACY).alias("mad_a"),
        F.sum((F.col("n_chars") <= F.col("med_a")).cast("bigint")).alias(
            "le_med"
        ),
        F.sum((F.col("n_chars") < F.col("med_a")).cast("bigint")).alias(
            "lt_med"
        ),
    )
    dev2 = dev.join(F.broadcast(s2.select("source", "mad_a")), "source")
    s3 = dev2.groupBy("source").agg(
        F.sum((F.col("adev_a") <= F.col("mad_a")).cast("bigint")).alias(
            "le_mad"
        ),
        F.sum((F.col("adev_a") < F.col("mad_a")).cast("bigint")).alias(
            "lt_mad"
        ),
    )
    n = F.col("n_docs")
    return (
        s1.join(s2, "source")
        .join(s3, "source")
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("med_e").alias("med"),
            F.col("mad_e").alias("mad"),
            _rank_ok(F.col("le_med"), F.col("lt_med"), n, 0.5).alias(
                "med_ok"
            ),
            _rank_ok(F.col("le_mad"), F.col("lt_mad"), n, 0.5).alias(
                "mad_ok"
            ),
        )
    )


ORACLES["docs_mad_outliers_approx"] = """
    WITH med AS (
      SELECT source, COUNT(*)::BIGINT AS n_docs,
             median(n_chars) AS med
      FROM documents GROUP BY source
    ), dev AS (
      SELECT d.source, abs(d.n_chars::DOUBLE - m.med) AS adev
      FROM documents d JOIN med m USING (source)
    ), mad AS (
      SELECT source, median(adev) AS mad FROM dev GROUP BY source
    )
    SELECT med.source, med.n_docs, med.med, mad.mad,
           1 AS med_ok, 1 AS mad_ok
    FROM med JOIN mad USING (source)
"""


# --------------------------------------------------------------------------
# events_distinct_users_approx
# --------------------------------------------------------------------------


def q_events_distinct_users_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Certified-approx twin of exact distinct-user counting (the
    `count_distinct` / `events_user_totals` family): per event type, HLL++
    `approx_count_distinct` next to the exact count, gated at 5× the
    sketch's 0.01 rsd. Emits exact counts (hash-pinned) plus the ok flag.

    Scale shape: ONE explicit (type, user) pre-dedup shuffle feeds both
    sides — the exact count needs it anyway, and HLL over the deduped
    frame is the *identical* sketch (HLL of a set equals HLL of the
    multiset) updated on ~|users| rows instead of every event (measured
    2× at sf0.1 vs piggybacking the sketch through Spark's
    distinct-aggregate path; the rsd=0.01 sketch's 2¹⁴ registers make
    per-row update cost visible). The 100 TB production form drops the
    exact side and runs the sketch alone over raw events — fixed-size
    mergeable state, no (type, user) shuffle at all; the flag certifies
    that swap.
    """
    e = read_table(spark, sf_dir, "events")
    pairs = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_ev")
    )
    agg = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_ev").alias("n_events"),
        F.approx_count_distinct("user_id", rsd=DISTINCT_RSD).alias("n_a"),
    )
    return agg.select(
        "event_type",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_events").cast("bigint").alias("n_events"),
        (
            F.abs(F.col("n_a").cast("double") - F.col("n_users"))
            / F.col("n_users")
            <= F.lit(DISTINCT_TOL)
        )
        .cast("int")
        .alias("distinct_ok"),
    )


ORACLES["events_distinct_users_approx"] = """
    SELECT event_type,
           COUNT(DISTINCT user_id)::BIGINT AS n_users,
           COUNT(*)::BIGINT AS n_events,
           1 AS distinct_ok
    FROM events GROUP BY event_type
"""


APPROX_TWIN_QUERIES.update(
    {
        "skew_profile_custkey_approx": (
            q_skew_profile_custkey_approx,
            ORACLES["skew_profile_custkey_approx"],
        ),
        "docs_mad_outliers_approx": (
            q_docs_mad_outliers_approx,
            ORACLES["docs_mad_outliers_approx"],
        ),
        "events_distinct_users_approx": (
            q_events_distinct_users_approx,
            ORACLES["events_distinct_users_approx"],
        ),
    }
)
