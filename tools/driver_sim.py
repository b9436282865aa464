"""Simulate the correctness driver against __spark_entry__.

Builds a VANILLA SparkSession (no engine confs — exactly what the driver
does), smoke-runs entry(), then runs every queries() entry at the given SF
and compares row-count / column names / order-insensitive values against
oracle_sql() via DuckDB. This is the engine's real runtime surface.

Usage: python tools/driver_sim.py [sf_dir] [query_name ...]
(with query names, only those registry entries are compared — for
iterating on one query without the full 8-minute sweep)
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    import decimal

    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object and len(out):
            s = out[c].dropna()
            if len(s):
                v = s.iloc[0]
                if isinstance(v, (datetime.date, datetime.datetime)):
                    out[c] = pd.to_datetime(out[c])
                elif isinstance(v, decimal.Decimal):
                    out[c] = out[c].astype(float)
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


def main() -> int:
    from pyspark.sql import SparkSession

    # vanilla session, like the driver's
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as e

    print("== entry() smoke ==")
    df = e.entry(spark)
    rows = df.collect()
    print(f"entry rows={len(rows)} schema={df.schema.simpleString()}")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    if ONLY:
        qs = {n: f for n, f in qs.items() if n in ONLY}
    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        try:
            got = canon(fn(spark, SF_DIR).toPandas())
            if name not in oracles:
                print(f"[rows-only] {name}: rows={len(got)} OK")
                n_pass += 1
                continue
            want = canon(con.execute(oracles[name]).df())
            assert list(got.columns) == list(want.columns), (
                f"cols {list(got.columns)} vs {list(want.columns)}"
            )
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            for c in got.columns:
                try:
                    pd.testing.assert_series_equal(
                        got[c], want[c], check_dtype=False, check_names=False,
                        check_exact=True,
                    )
                except AssertionError:
                    g, w = got[c], want[c]
                    diff = (g != w) & ~(g.isna() & w.isna())
                    if int(diff.sum()):
                        raise
            print(f"[match]     {name}: rows={len(got)} OK")
            n_pass += 1
        except Exception as ex:
            print(f"[FAIL]      {name}: {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed at {SF_DIR}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
