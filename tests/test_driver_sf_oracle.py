"""Driver-SF (sf0.01) oracle checks for the entries whose hash signal
is a DATA PROPERTY with a threshold in it — recall floors, 3*rsd
sketch-accuracy bounds, LSH recall — plus the one entry that failed
the driver hash in rounds 2-3. The main oracle sweep runs at sf0.001
for speed; these entries' booleans could in principle hold there and
flip at the driver's sf0.01, so they get the exact driver comparison.
Everything here is deterministic (fixed hashes / seeds), so a pass at
sf0.01 IS a driver-green guarantee, not a probability.
"""

import pytest

from impala_hashset_count_spark.plans import all_queries

from .oracle_harness import compare_query

QUERIES = all_queries()

DRIVER_SF_ENTRIES = [
    # threshold-boolean signals: bounds must hold at the driver's SF
    "approx_distinct_lineitem",
    "similarity_ann_topk",
    # LSH-recall == 1 and hash-collision-freeness at the driver's SF
    "dedup_minhash_lsh",
    # rounds-2/3 driver-only hash failure (HUGEINT dtype class): keep
    # the exact driver comparison pinned at the driver's SF
    "corpus_stats_documents",
]


@pytest.mark.parametrize("name", DRIVER_SF_ENTRIES)
def test_driver_sf_oracle_match(spark, sf_medium, name):
    q = QUERIES[name]
    compare_query(spark, sf_medium, name, q.fn, q.oracle)
