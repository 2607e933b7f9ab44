"""Custom connectors through Spark 4's Python DataSource API — the
public ABI for user-defined sources/sinks (batch read, streaming read,
batch write), the PySpark-native analogue of the host-engine plugin
surface the reference relied on (its UDA registered into Impala via
``CREATE AGGREGATE FUNCTION`` — `/root/reference/README.md:25-33`; a
source/sink plugs into Spark the same "declare and register" way).

Two connectors:

- ``synthetic_events`` — a deterministic event generator (batch AND
  micro-batch streaming faces). Every field derives from xxhash64-style
  mixing of (seed, row index): no RNG state to coordinate across
  executors, identical output for a given (rows, seed) on any cluster
  topology, and the stream face replays any offset range exactly —
  which is what makes it usable as a load generator in tests and
  benchmarks (the same role Spark's built-in ``rate`` source plays,
  but with a realistic keyed event schema and exact replayability).

- ``jsonl`` writer — a line-delimited-JSON sink demonstrating the
  executor-write/driver-commit protocol: each task writes one part
  file and returns a commit message; the driver's ``commit`` writes a
  ``_SUCCESS`` manifest listing exactly the committed files (readers
  that honor the manifest see no torn output from failed/speculative
  tasks; ``abort`` removes the orphans).

Parallelism notes (100 TB posture): the batch reader fans out over
``numPartitions`` InputPartitions, each generating only its slice; the
stream reader is driver-paced by design (SimpleDataSourceStreamReader)
and meant for tests — a production firehose would implement the
partitioned ``streamReader`` ABI instead.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ("view", "click", "purchase", "refund")

_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, "
    "amount double, ts timestamp"
)

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _mix(seed: int, i: int) -> int:
    """Deterministic 64-bit mix of (seed, row index) — splitmix64
    finalizer, the standard stateless per-index generator (no RNG
    object whose state would differ across executors/retries)."""
    z = (i + seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def synth_event(seed: int, i: int) -> tuple:
    """The reference generator for row ``i``: pure function of
    (seed, i), shared by the batch reader, the stream reader, and the
    tests (which recompute expected rows with it)."""
    h = _mix(seed, i)
    user_id = h % 1000
    event_type = EVENT_TYPES[(h >> 10) % len(EVENT_TYPES)]
    amount = ((h >> 16) % 100000) / 100.0
    ts = (_EPOCH + timedelta(seconds=i)).replace(tzinfo=None)
    return (i, user_id, event_type, amount, ts)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``.

    Options: ``rows`` (default 1000), ``numPartitions`` (default 8),
    ``seed`` (default 42); streaming adds ``rowsPerBatch``
    (default 100)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        # Pushdown is an OPT-IN reader class: the Spark worker REJECTS
        # any reader that implements pushFilters() while
        # spark.sql.python.filterPushdown.enabled is false (the 4.1
        # default), so the capability must not leak into sessions that
        # haven't enabled the conf.
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return _SyntheticPushdownReader(self.options)
        return _SyntheticBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SyntheticStreamReader(self.options)


class _SyntheticBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))
        self.seed = int(options.get("seed", 42))
        self.lo_bound = 0
        self.hi_bound = self.rows

    def partitions(self):
        # contiguous row-range slices over the (possibly filter-
        # narrowed) index range; the last partition takes the
        # remainder. Each executor task generates ONLY its slice.
        # An empty range is a legal bound -> one empty partition.
        lo0, hi0 = max(0, self.lo_bound), min(self.rows, self.hi_bound)
        if hi0 <= lo0:
            return [InputPartition((0, 0))]
        per = -(-(hi0 - lo0) // self.num_partitions)
        return [
            InputPartition((lo, min(lo + per, hi0)))
            for lo in range(lo0, hi0, per)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for i in range(lo, hi):
            yield synth_event(self.seed, i)


class _SyntheticPushdownReader(_SyntheticBatchReader):
    """Batch reader with REAL filter pushdown (``pushFilters``,
    Spark 4.1 Python DataSource ABI): ``event_id`` IS the row index,
    so comparison/equality predicates on it translate into index-range
    pruning — ``partitions()`` then fans out over the NARROWED range
    and the untouched rows are never generated at all (the Python-
    connector analogue of parquet row-group pruning). Accepted filters
    are consumed (not returned); everything else is left for Spark to
    evaluate post-scan, per the ABI contract. Opt-in via
    ``option("pushdown", "true")`` + the session conf
    ``spark.sql.python.filterPushdown.enabled=true``."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            IsNotNull,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            val = getattr(f, "value", None)
            on_id = tuple(attr or ()) == ("event_id",)
            if on_id and isinstance(f, IsNotNull):
                continue  # generated event_id is never NULL: accepted for free
            if not (on_id and isinstance(val, int)):
                yield f
                continue
            if isinstance(f, EqualTo):
                self.lo_bound = max(self.lo_bound, val)
                self.hi_bound = min(self.hi_bound, val + 1)
            elif isinstance(f, GreaterThan):
                self.lo_bound = max(self.lo_bound, val + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo_bound = max(self.lo_bound, val)
            elif isinstance(f, LessThan):
                self.hi_bound = min(self.hi_bound, val)
            elif isinstance(f, LessThanOrEqual):
                self.hi_bound = min(self.hi_bound, val + 1)
            else:
                yield f


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch face: offset = {"index": next row to emit}. Any
    (start, end) range replays exactly (pure function of the index),
    which is the contract checkpoint recovery depends on.

    ``maxRows`` (optional) bounds the stream: once exhausted, ``read``
    returns the UNCHANGED offset with no rows, so
    ``processAllAvailable()`` converges — without a bound the source
    is a firehose and "all available" never drains."""

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        mr = options.get("maxrows")
        self.max_rows = int(mr) if mr is not None else None

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        lo = start["index"]
        hi = lo + self.rows_per_batch
        if self.max_rows is not None:
            hi = min(hi, self.max_rows)
        if hi <= lo:
            return iter([]), {"index": lo}
        return (
            iter([synth_event(self.seed, i) for i in range(lo, hi)]),
            {"index": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            [synth_event(self.seed, i) for i in range(start["index"], end["index"])]
        )


# ---------------------------------------------------------------------
# jsonl writer
# ---------------------------------------------------------------------

@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    rows: int


class JsonlDataSource(DataSource):
    """Line-delimited-JSON sink:
    ``df.write.format("jsonl").mode(...).save(path)``. Readable back
    with ``spark.read.json`` (or any JSONL consumer). Timestamps are
    ISO-formatted; None maps to JSON null."""

    @classmethod
    def name(cls) -> str:
        return "jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _JsonlStreamWriter(self.options)


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl writer requires a path")
        # The writer is constructed DRIVER-side (then pickled to
        # tasks), so overwrite cleanup happens here, before any task
        # writes: otherwise mode('overwrite') would silently append —
        # stale part files from the previous job survive and a plain
        # JSONL reader (which ignores the manifest) returns their rows
        # too.
        if overwrite and os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if f.endswith(".jsonl") or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))

    def write(self, iterator: Iterator) -> _FileCommit:
        # Executor side: one part file per task, unique name so
        # speculative/failed attempts can never collide; only files
        # listed in the driver-committed manifest count.
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                rec = {
                    k: (v.isoformat() if isinstance(v, datetime) else v)
                    for k, v in row.asDict().items()
                }
                f.write(json.dumps(rec, sort_keys=True) + "\n")
                n += 1
        return _FileCommit(filename=fname, rows=n)

    def commit(self, messages) -> None:
        # Driver side: the manifest IS the commit point.
        manifest = {
            "files": sorted(m.filename for m in messages),
            "rows": sum(m.rows for m in messages),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages) -> None:
        # Failed tasks contribute None commit messages (per the
        # DataSourceWriter contract) — and abort runs precisely when
        # at least one task failed, so None entries are the norm here.
        # A failed task's own part file has an unknown uuid name and
        # cannot be removed; that is safe by construction, because
        # only files listed in the _SUCCESS manifest count as data.
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming face of the jsonl sink: the same executor-write/
    driver-commit protocol, per MICRO-BATCH. Each batch commits its own
    ``_SUCCESS-<batchId>`` manifest; a reader that unions only
    manifested files sees exactly-once output even though a recovered
    batch may re-write part files — replayed attempts produce new uuid
    part names, and re-committing a batchId REPLACES its manifest, so
    orphans from the failed attempt are never listed. This is the sink
    half of the durable-offsets contract the stream READER proves
    (tests/test_streaming.py checkpoint tests): source offsets make a
    batch replayable, the manifest makes its output idempotent."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl stream writer requires a path")

    def write(self, iterator: Iterator) -> _FileCommit:
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                rec = {
                    k: (v.isoformat() if isinstance(v, datetime) else v)
                    for k, v in row.asDict().items()
                }
                f.write(json.dumps(rec, sort_keys=True) + "\n")
                n += 1
        return _FileCommit(filename=fname, rows=n)

    def commit(self, messages, batchId: int) -> None:
        manifest = {
            "batch_id": batchId,
            "files": sorted(m.filename for m in messages),
            "rows": sum(m.rows for m in messages),
        }
        with open(os.path.join(self.path, f"_SUCCESS-{batchId}"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


def read_jsonl_manifested(path: str) -> list[dict]:
    """Read back ONLY manifested rows (batch ``_SUCCESS`` or streaming
    ``_SUCCESS-<batchId>`` manifests) — the consumer contract that
    makes the sink exactly-once."""
    rows: list[dict] = []
    for f in sorted(os.listdir(path)):
        if not (f == "_SUCCESS" or f.startswith("_SUCCESS-")):
            continue
        with open(os.path.join(path, f)) as fh:
            manifest = json.load(fh)
        for part in manifest["files"]:
            with open(os.path.join(path, part)) as fh:
                rows.extend(json.loads(line) for line in fh if line.strip())
    return rows


def register_python_datasources(spark) -> None:
    """Idempotent registration of both connectors. Ships the package
    to Python workers first: a DataSource class pickles BY REFERENCE,
    so the worker must be able to import this module regardless of the
    driver's CWD/PYTHONPATH (on a real cluster this is the job's
    wheel/zip deployment)."""
    from ..session import ship_package

    ship_package(spark)
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlDataSource)
