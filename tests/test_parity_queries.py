"""Every declared (query, oracle) pair must hash-match — the driver's t2 gate,
run locally at sf0.001 (set SPARK_GRAFT_TEST_SF_DIR to test other SFs)."""

from __future__ import annotations

import pytest

from filmdatawarehouse_spark.queries.registry import all_queries
from tests.conftest import assert_matches_oracle

REGISTRY = all_queries()
ORACLE_CASES = sorted(n for n, (_f, sql) in REGISTRY.items() if sql is not None)
ROWS_ONLY_CASES = sorted(n for n, (_f, sql) in REGISTRY.items() if sql is None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn, sql = REGISTRY[name]
    assert_matches_oracle(fn(spark, sf_dir), duck, sql)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_query_runs(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    # driver checks a stable schema
    assert [f.name for f in df.schema.fields] == ["p_name", "total_quantity"]


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 13
