"""Registry-wide contract lints — properties every entry must hold for
the external driver gate to be able to verify it at all.

Round-2 lesson: ``scalar_array_embeddings`` returned an ARRAY column
and the driver's canonicalizer (a pandas ``sort_values`` over the
result frame) crashed on the unhashable array cells, turning a locally
green query into an *unverifiable* driver row. These lints make the
whole class impossible to reintroduce.
"""

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from impala_hashset_count_spark.plans import all_queries

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


def test_registry_size_within_sweep_cap():
    """The driver's correctness sweep covers exactly 50 entries; more
    would silently go unproven (the round-1 failure mode)."""
    assert len(QUERIES) <= 50


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_query_outputs_atomic_columns_only(spark, sf_small, name):
    """Every oracle-checked query must return only atomic (sortable,
    hashable) columns: the driver canonicalizes via a pandas sort, which
    cannot sort array/map/struct cells. Schema-only — no job runs."""
    df = QUERIES[name].fn(spark, sf_small)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-atomic output columns {bad} would crash the "
        f"driver's canonicalizer — emit a scalar rendering instead"
    )


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_query_has_no_unaliased_columns(spark, sf_small, name):
    """Column names must be stable identifiers on both sides — an
    unaliased aggregate like ``sum(l_quantity)`` or ``round(x, 2)``
    will never line up with the oracle's alias."""
    df = QUERIES[name].fn(spark, sf_small)
    bad = [c for c in df.columns if "(" in c or ")" in c or " " in c]
    assert not bad, f"{name}: suspicious auto-generated column names {bad}"


@pytest.mark.parametrize(
    "name",
    [
        # every oracle query whose output carries a float derived from
        # an order-dependent aggregate (SUM/AVG/STDDEV over doubles) —
        # the class that hash-failed corpus_stats in round 2
        "corpus_stats_documents",
        "tpch_q1_pricing_summary",
        "join_star_revenue",
        "join_salted_skew",
        "percentile_stats_events",
        "funnel_view_click_purchase",
        "scalar_array_embeddings",
        "analytics_cohort_retention",
    ],
)
def test_float_query_partition_sweep_stability(spark, sf_small, monkeypatch, name):
    """Canonical output must be BIT-identical at 2/8/32 shuffle
    partitions: summation-order independence is a tested property for
    every float-emitting oracle query, not just the one that failed."""
    q = QUERIES[name]
    outs = []
    for n in ("2", "8", "32"):
        monkeypatch.setenv("SPARK_GRAFT_CPUS", n)
        outs.append(sorted(map(tuple, q.fn(spark, sf_small).collect())))
    assert outs[0] == outs[1] == outs[2]
