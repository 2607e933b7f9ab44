"""Driver-gate replica: every registered query with an oracle must
hash-match DuckDB on the same parquet at sf0.001 (fast) — the driver
runs the same comparison at sf0.01."""

import pytest

from impala_hashset_count_spark.plans import all_queries

from .oracle_harness import compare_query

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_small, name):
    q = QUERIES[name]
    compare_query(spark, sf_small, name, q.fn, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_small, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_small)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
