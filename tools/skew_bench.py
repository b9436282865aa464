"""Micro-bench: measured straggler win of the two skew treatments —
explicit salting (`operators/skew.salted_join`) and AQE's runtime
skew-join split — against a plain sort-merge join on a synthetically hot
key.

The corpus keys are uniform, so skew is planted deterministically: half
of lineitem's rows are remapped to ONE supplier key (`key 0`), the
50%-hot-key regime where a plain shuffle puts ~300k of 600k rows on a
single reduce task. Variants, all with broadcast disabled (the sort-merge
regime — with a broadcastable dim nothing shuffles and skew is moot):

  plain          AQE skew-split OFF — the straggler baseline
  aqe_skew       AQE skew-split ON  — Spark's runtime fix
  salted         salted_join, AQE split OFF — the explicit fix

Metrics per variant: warm wall seconds (min of 2), plus the fact-side
REDUCE-PARTITION row distribution (max / p50) computed with Spark's own
partitioning arithmetic — ``pmod(murmur3_hash(keys), n)`` is exactly what
``hashpartitioning`` does — for the plain key vs the salted key pair.
The max is what the straggler task's runtime is proportional to.

Usage: python tools/skew_bench.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

def main() -> None:
    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.io.sources import read_table
    from filmdatawarehouse_spark.operators.skew import salted_join
    from filmdatawarehouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("skew-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # make the skew visible to the reader of the output regardless of AQE
    # coalescing: a fixed shuffle partition count
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    # suppkeys in the lower HALF of the domain all collapse to key 0 —
    # ~50% of the fact on one key at any SF
    hot_below = int(
        read_table(spark, sf_dir, "supplier")
        .agg(F.max("s_suppkey"))
        .collect()[0][0]
        // 2
    )

    def fact():
        li = read_table(spark, sf_dir, "lineitem").select(
            "l_suppkey", "l_extendedprice"
        )
        return li.withColumn(
            "k",
            F.when(F.col("l_suppkey") < hot_below, F.lit(0))
            .otherwise(F.col("l_suppkey"))
            .cast("long"),
        ).select("k", "l_extendedprice")

    def dim():
        return (
            read_table(spark, sf_dir, "supplier")
            .select(F.col("s_suppkey").cast("long").alias("k"), "s_name")
        )

    def run(df):
        # warm twice, report min
        t = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t.append(time.perf_counter() - t0)
        return round(min(t), 4)

    out = {}

    def record(name, df, skew_split):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_split).lower()
        )
        out[name] = {"sec_warm": run(df)}

    record("plain", fact().join(dim(), "k"), skew_split=False)
    record("aqe_skew", fact().join(dim(), "k"), skew_split=True)
    record("salted", salted_join(fact(), dim(), on="k"), skew_split=False)

    # reduce-partition row distribution, by Spark's own partitioning
    # arithmetic (hashpartitioning = pmod(murmur3, n)); the salted
    # distribution replays salted_join's deterministic row salt
    from filmdatawarehouse_spark.operators.skew import _row_salt

    n_part = 32

    def partition_stats(keyed, label):
        dist = keyed.groupBy("p").agg(F.count(F.lit(1)).alias("rows")).agg(
            F.max("rows").alias("max_rows"),
            F.expr("percentile(rows, 0.5)").alias("p50_rows"),
            F.count(F.lit(1)).alias("n_nonempty_partitions"),
        )
        r = dist.collect()[0]
        out[label] = {
            "max_partition_rows": int(r["max_rows"]),
            "p50_partition_rows": float(r["p50_rows"]),
            "n_nonempty_partitions": int(r["n_nonempty_partitions"]),
        }

    f = fact()
    partition_stats(
        f.select(F.pmod(F.hash("k"), F.lit(n_part)).alias("p")),
        "plain_partitioning",
    )
    fs = f.withColumn("_salt", _row_salt(f, 16))
    partition_stats(
        fs.select(F.pmod(F.hash("k", "_salt"), F.lit(n_part)).alias("p")),
        "salted_partitioning",
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
