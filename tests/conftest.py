"""Shared session fixture + driver-style oracle comparison helper."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from filmdatawarehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fdw-tests", master="local[8]", shuffle_partitions=8)
    yield s
    from filmdatawarehouse_spark.operators.cache import release_managed

    release_managed()
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted by all
    columns, fresh index. Dtype-normalized (date objects → datetime64,
    Decimal → float) so representation differences don't mask value equality."""
    import datetime
    import decimal

    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object and len(out):
            sample = out[c].dropna()
            if len(sample):
                v = sample.iloc[0]
                if isinstance(v, (datetime.date, datetime.datetime)):
                    out[c] = pd.to_datetime(out[c])
                elif isinstance(v, decimal.Decimal):
                    out[c] = out[c].astype(float)
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, oracle: str) -> None:
    """Compare a Spark result to the DuckDB oracle the way the driver does:
    row count, column names, and order-insensitive values."""
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(duck_con.execute(oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    # exact value compare (dtype-lenient: decimal vs object, int32 vs int64)
    for c in got.columns:
        g, w = got[c], want[c]
        try:
            pd.testing.assert_series_equal(
                g, w, check_dtype=False, check_names=False, check_exact=True
            )
        except AssertionError:
            # assert_series_equal can trip on representation details (NaT in
            # object vs datetime64, unit width); elementwise equality is the
            # authority — fail only on actual value differences
            diff = (g != w) & ~(g.isna() & w.isna())
            if int(diff.sum()) == 0:
                continue
            raise AssertionError(
                f"column {c!r}: {int(diff.sum())} mismatched values; "
                f"first: got={g[diff].head(3).tolist()} want={w[diff].head(3).tolist()}"
            ) from None
