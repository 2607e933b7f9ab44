"""The reference aggregate on Spark 4's ``transformWithStateInPandas``
— the successor stateful API to ``applyInPandasWithState`` (which
carries the other face of this operator in ``windows.py``).

Why a second stateful face: the old API hands each key its ENTIRE
state blob per batch (the set is deserialized, unioned, re-serialized
every micro-batch — O(state) per batch per key). ``transformWithState``
exposes typed state PRIMITIVES backed by the RocksDB state store:
``MapState`` does per-value point lookups/inserts and ``ValueState``
holds the running count, so a micro-batch costs O(new values) work and
I/O regardless of how large the accumulated distinct set has grown.
At the reference's own design point — up to ~300k distincts per group
(`/root/reference/README.md:11-12`) — that is the difference between
re-shipping 300k strings per key per batch and touching only the
handful that arrived.

Semantics are the faithful tier's (SURVEY.md §8): NULLs don't count, a
key with no non-NULL rows ever yields SQL NULL (not "0"), the count is
a decimal STRING, values compare by their string form.

``transformWithState`` requires the RocksDB state store provider
(``rocksdb_conf()`` returns the conf pair) AND the ``protobuf``
package (PySpark's state-server protocol is protobuf-framed). This
container ships no protobuf, so the live micro-batch test is
availability-gated (``HAS_PROTOBUF`` — the same honest-gate pattern
as the PIL decode tier) while the processor's STATE LOGIC is fully
tested against in-memory fake state handles; the
``applyInPandasWithState`` face in ``windows.py`` remains the
live-proven stateful path in this environment.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

TWS_OUTPUT_SCHEMA = "event_type string, hashset_count string"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

try:  # the transformWithState wire protocol needs protobuf
    import google.protobuf  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:  # pragma: no cover - environment-dependent
    HAS_PROTOBUF = False


def rocksdb_conf() -> tuple[str, str]:
    return ("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


class HashsetCountProcessor(StatefulProcessor):
    """Running exact distinct count per key. State layout:

    - ``seen``:  MapState keyed by the value string — membership test
      and insert are per-value point operations against RocksDB (the
      state-store analogue of the reference's hash-set probe+append,
      `/root/reference/hashset-count.cc:124-189`).
    - ``n``:     ValueState holding the running count, so emitting a
      snapshot never iterates the map.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getMapState("seen", "v string", "one tinyint")
        self._n = handle.getValueState("n", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        cur = self._n.get()
        n = cur[0] if cur is not None else 0
        for pdf in rows:
            # batch-local pre-distinct before the state probes (the
            # same move the batch UDAF makes JVM-side): each distinct
            # new value costs exactly one containsKey + one update.
            # The value column arrives as STRING (cast JVM-side in
            # hashset_count_tws): a bigint column holding any NULL
            # would reach pandas as float64 and silently collapse ids
            # above 2^53 — string transport keeps byte-exact values,
            # which is also the reference's own input type
            # (`/root/reference/hashset-count.h:31`).
            for sv in pdf["user_id"].dropna().unique():
                if not self._seen.containsKey((sv,)):
                    self._seen.updateValue((sv,), (1,))
                    n += 1
        self._n.update((n,))
        yield pd.DataFrame(
            {"event_type": [key[0]], "hashset_count": [str(n) if n else None]}
        )

    def close(self) -> None:
        pass


def hashset_count_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` wiring of the processor; input
    needs (event_type, user_id). Update mode, no timers. The processor
    class pickles BY REFERENCE, so the package is shipped to the
    (driver-side and executor-side) Python workers first."""
    from ..session import ship_package

    ship_package(events.sparkSession)
    return (
        events.select("event_type", F.col("user_id").cast("string").alias("user_id"))
        .groupBy("event_type")
        .transformWithStateInPandas(
            HashsetCountProcessor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
