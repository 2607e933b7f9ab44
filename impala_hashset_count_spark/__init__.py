"""PySpark-native analytics engine with the capabilities of
Peter-Ebert/impala-hashset-count.

The reference (`/root/reference/hashset-count.cc`) is an Impala UDA: an
exact, grouped, multi-instance distinct-count aggregate. This package
rebuilds that capability Spark-first:

- ``operators.hashset_count`` — the aggregate itself, three tiers
  (idiomatic built-in, faithful pandas UDAF, RDD structural twin).
- ``plans.parity`` — the host SQL surface the UDA plugs into
  (scans, joins, aggregation, windows, set ops, scalar functions),
  expressed as DataFrame/SQL plans Catalyst can optimize.
- ``operators.dedup`` / ``operators.similarity`` /
  ``functions.text`` / ``operators.multimodal`` /
  ``streaming`` — the LLM-data-pipeline extensions
  (north star in BASELINE.json), each designed for 100 TB scale.
"""

__version__ = "0.1.0"
