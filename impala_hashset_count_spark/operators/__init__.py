from .hashset_count import (
    approx_distinct_count,
    hashset_count_agg,
    hashset_count_df,
    hashset_count_rdd,
    make_hashset_count_udaf,
    register_sql_udaf,
)

__all__ = [
    "approx_distinct_count",
    "hashset_count_agg",
    "hashset_count_df",
    "hashset_count_rdd",
    "make_hashset_count_udaf",
    "register_sql_udaf",
]
