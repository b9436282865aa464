"""Micro-bench: Bloom-prefiltered vs plain shuffled join (VERDICT r05
item 7 — `bloom_prefilter_join` certifies prefilter+join ≡ plain join;
this measures the WIN: fact-side shuffle rows and wall time).

Broadcast joins are disabled for the measurement so both variants take the
sort-merge path — the regime where the Bloom probe pays off (with a
broadcastable dim Spark never shuffles the fact and the filter is moot;
at 100 TB the interesting dims are the ones too big to broadcast or the
cases where AQE's own runtime filter doesn't fire).

Usage: python tools/bloom_bench.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line with per-variant wall seconds and every shuffle
exchange's recordsRead from the executed adaptive plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def exchange_records(df) -> list[int]:
    """recordsRead of every shuffle exchange (shared adaptive-plan
    walker, filmdatawarehouse_spark.plans)."""
    from filmdatawarehouse_spark.plans import executed_exchange_records

    return executed_exchange_records(df)


def main() -> None:
    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.io.sources import read_table
    from filmdatawarehouse_spark.operators.bloom import (
        bloom_prefilter,
        build_bloom,
    )
    from filmdatawarehouse_spark.queries.bigjoin import BLOOM_NATION
    from filmdatawarehouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bloom-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def supp():
        return (
            read_table(spark, sf_dir, "supplier")
            .filter(F.col("s_nationkey") == BLOOM_NATION)
            .select("s_suppkey", "s_name")
        )

    def fact():
        return read_table(spark, sf_dir, "lineitem").select(
            "l_suppkey", "l_extendedprice", "l_discount"
        )

    def agg(joined):
        revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
            F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)")
        )
        return joined.groupBy("s_suppkey", "s_name").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )

    n_fact = fact().count()
    n_dim = supp().count()
    n_dim_all = read_table(spark, sf_dir, "supplier").count()

    results = {}
    # first pass is cold, second warm — recorded SEPARATELY (an earlier
    # cut stored both under one key, silently reporting only warm)
    for pass_name in ("cold", "warm"):
        for variant in ("plain", "bloom"):
            li, s = fact(), supp()
            t0 = time.time()
            if variant == "bloom":
                li = bloom_prefilter(
                    li, build_bloom(s, "s_suppkey"), "l_suppkey"
                )
            df = agg(li.join(s, li.l_suppkey == s.s_suppkey))
            recs = exchange_records(df)
            dt = time.time() - t0
            results[f"{variant}_{pass_name}"] = {
                "sec": round(dt, 3),
                "exchange_records": recs,
                "max_exchange": max(recs) if recs else 0,
            }

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "fact_rows": n_fact,
                "dim_rows_selected": n_dim,
                "dim_rows_total": n_dim_all,
                "selectivity": round(n_dim / n_dim_all, 4),
                **results,
                "shuffle_rows_reduction": round(
                    1
                    - results["bloom_warm"]["max_exchange"]
                    / max(results["plain_warm"]["max_exchange"], 1),
                    4,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
