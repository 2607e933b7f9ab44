"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke check at sf0.001).
``queries()`` — every implemented operator from SURVEY.md §2, one
callable per name, backed by ``impala_hashset_count_spark.plans``.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin for each query (omitted
only for genuinely non-SQL-expressible ops, e.g. probabilistic LSH and
custom stateful streaming — the driver then records a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's motivating workload — multiple exact
    distinct counts in one grouped pass (`/root/reference/README.md:1`)
    over sf0.001 lineitem."""
    tune_session(spark)
    q = all_queries()["multi_distinct_lineitem"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
