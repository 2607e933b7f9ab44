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
def test_rows_only_runs_and_is_deterministic(spark, sf_small, name):
    """Any query without a SQL oracle gets only a rows-only driver
    check — which would silently admit nondeterminism — so assert two
    invocations in one session produce identical results. As of round
    4 the set is EMPTY (all 50 entries carry oracles: the HLL, LSH and
    ANN tiers now hash derived exact/boolean surfaces); this guard
    stays for any future rows-only entry."""
    q = QUERIES[name]
    a = q.fn(spark, sf_small)
    assert len(a.schema.fields) > 0
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, q.fn(spark, sf_small).collect()))
    assert rows_a == rows_b
    assert len(rows_a) >= 0


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
