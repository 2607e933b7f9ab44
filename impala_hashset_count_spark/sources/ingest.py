"""Heterogeneous-source ingestion + training-shard export.

Two ends of the corpus lifecycle the table-centric modules don't cover:

- ``harmonize_schemas`` — union N dataframes whose schemas drifted
  (different dumps, crawler versions, partner feeds): align columns by
  NAME, widen conflicting primitive types along the numeric ladder,
  fill missing columns with NULL. At 100 TB the alternative is a
  per-source hand-written select list that silently breaks on the next
  drift; this makes the union rule explicit, deterministic, and
  strict-mode enforceable.
- ``write_training_shards`` — materialize the deterministic global
  training order (`operators/sampling.shuffle_rows`) as numbered
  parquet shard files plus a manifest: a data loader streams shards in
  manifest order and sees exactly the epoch's global shuffle, with no
  coordination beyond reading a JSON file.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Primitive widening ladder: every type promotes to any type to its
#: right with no value loss (int->double loses ulps above 2^53 — the
#: standard SQL promotion, accepted and documented).
_LADDER = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
]


def _widen(a: T.DataType, b: T.DataType, strict: bool) -> T.DataType:
    if a == b:
        return a
    if a in _LADDER and b in _LADDER:
        hi = _LADDER[max(_LADDER.index(a), _LADDER.index(b))]
        # LONG meets FLOAT: float keeps only 24 mantissa bits — the
        # standard SQL answer is DOUBLE (same rule Spark's own union
        # coercion applies); every other pair's ladder max is the
        # conventional promotion
        if hi == T.FloatType() and T.LongType() in (a, b):
            return T.DoubleType()
        return hi
    if strict:
        raise TypeError(
            f"incompatible column types {a.simpleString()} vs "
            f"{b.simpleString()} (strict mode)"
        )
    # widen mode: anything else unifies as its string rendering —
    # lossless for display/token purposes and always castable
    return T.StringType()


def harmonize_schemas(
    dfs: list[DataFrame], strict: bool = False
) -> DataFrame:
    """Union dataframes with drifted schemas by COLUMN NAME.

    Column order is first-appearance across the inputs; a column
    missing from an input becomes NULL of the unified type; primitive
    numeric types widen along byte<short<int<long<float<double; any
    other conflict unifies as STRING (``strict=True`` raises instead —
    the mode for pipelines where silent stringification would hide a
    real upstream break). Complex types (array/map/struct) must match
    exactly; mismatches raise in both modes (widening element types
    inside nested structures is a schema-migration job, not a union
    rule).

    Purely declarative: each input gets one ``select`` of casts /
    NULL literals, then ``unionByName`` — no data pass beyond the
    union itself, so it composes with pushdown and pruning like any
    hand-written union."""
    if not dfs:
        raise ValueError("harmonize_schemas needs at least one DataFrame")
    order: list[str] = []
    types: dict[str, T.DataType] = {}
    for df in dfs:
        for f in df.schema.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
            else:
                cur, new = types[f.name], f.dataType
                if cur != new and (
                    isinstance(cur, (T.ArrayType, T.MapType, T.StructType))
                    or isinstance(new, (T.ArrayType, T.MapType, T.StructType))
                ):
                    raise TypeError(
                        f"column {f.name!r}: complex types must match exactly "
                        f"({cur.simpleString()} vs {new.simpleString()})"
                    )
                types[f.name] = _widen(cur, new, strict)
    aligned = []
    for df in dfs:
        have = {f.name for f in df.schema.fields}
        cols = [
            (
                F.col(name).cast(types[name])
                if name in have
                else F.lit(None).cast(types[name])
            ).alias(name)
            for name in order
        ]
        aligned.append(df.select(*cols))
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    seed: str = "",
    n_shards: int | None = None,
) -> dict:
    """Materialize one epoch's deterministic global shuffle as shard
    files + a manifest.

    The order comes from ``shuffle_rows`` (md5(seed || key) total
    order realized as contiguous-range shards); each output partition
    writes one parquet file, and the manifest records, per shard file,
    the row count and the [min, max] shuffle-key range FROM THE
    PARQUET FOOTERS (no second data scan). Reading the files in
    manifest order therefore reproduces the exact global order —
    property a data loader needs to stream an epoch with zero
    coordination. Returns the manifest dict (also written to
    ``<path>/manifest.json``).

    Replays: the write is mode=overwrite and both the order and the
    shard boundaries are deterministic given (data, seed), so a retry
    reproduces identical shard CONTENTS, boundaries, and counts (the
    physical file names carry the write's task UUIDs and differ).

    Works on ANY Hadoop-supported scheme: the parquet write goes
    through Spark, and when ``path`` carries a scheme
    (``file://``/``s3a://``/``hdfs://`` ...) the manifest step lists
    the directory and reads FOOTERS through the session's Hadoop
    FileSystem (`sources/hadoopfs.py` — footer-only positioned reads,
    no data pages, no local-disk assumption). Scheme-less paths keep
    the driver-local ``os``/``open`` fast path."""
    from ..operators.sampling import shuffle_rows
    from . import hadoopfs

    ordered = shuffle_rows(df, key_col, seed=seed, n_shards=n_shards, keep_key=True)
    ordered.write.mode("overwrite").parquet(path)

    import pyarrow.parquet as pq

    spark = df.sparkSession
    use_hadoop = hadoopfs.is_uri(path)
    if use_hadoop:
        listing = [
            (e.path.rsplit("/", 1)[1], e.path)
            for e in hadoopfs.list_files(
                spark, path, suffix=".parquet", recursive=False
            )
        ]
    else:
        listing = [
            (fname, os.path.join(path, fname))
            for fname in sorted(os.listdir(path))
            if fname.endswith(".parquet")
        ]
    shards = []
    for fname, full in listing:
        md = (
            hadoopfs.read_parquet_metadata(spark, full)
            if use_hadoop
            else pq.ParquetFile(full).metadata
        )
        lo = hi = None
        key_idx = None
        for ci in range(md.row_group(0).num_columns if md.num_row_groups else 0):
            if md.row_group(0).column(ci).path_in_schema == "__shuffle_key":
                key_idx = ci
                break
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(key_idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        shards.append(
            {"file": fname, "n_rows": md.num_rows, "key_min": lo, "key_max": hi}
        )
    # manifest order == global order: shards hold contiguous,
    # non-overlapping ranges, so sorting by key_min is the epoch order
    # (empty shards — possible when n_shards exceeds distinct keys —
    # sort last and contribute nothing)
    shards.sort(key=lambda s: (s["key_min"] is None, s["key_min"]))
    manifest = {
        "seed": str(seed),
        "key_col": key_col,
        "n_rows": sum(s["n_rows"] for s in shards),
        "shards": shards,
    }
    payload = json.dumps(manifest, indent=1).encode()
    if use_hadoop:
        hadoopfs.write_bytes(spark, path.rstrip("/") + "/manifest.json", payload)
    else:
        with open(os.path.join(path, "manifest.json"), "wb") as fh:
            fh.write(payload)
    return manifest


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read an exported epoch IN ORDER: files in manifest order, each
    shard internally sorted by the shuffle key (as written). The
    returned frame carries ``__shard_id`` (manifest position) and
    ``__shuffle_key``, so ``orderBy(__shard_id, __shuffle_key)``
    reproduces the global order inside Spark; a plain data loader just
    streams the files sequentially. Scheme'd paths
    (``file://``/``s3a://``/...) fetch the manifest through the
    session's Hadoop FileSystem (`sources/hadoopfs.py`); scheme-less
    paths keep the driver-local ``open`` fast path — same routing as
    ``write_training_shards``."""
    from . import hadoopfs

    if hadoopfs.is_uri(path):
        manifest = json.loads(
            hadoopfs.read_bytes(spark, path.rstrip("/") + "/manifest.json")
        )
        join = lambda f: path.rstrip("/") + "/" + f  # noqa: E731
    else:
        with open(os.path.join(path, "manifest.json")) as fh:
            manifest = json.load(fh)
        join = lambda f: os.path.join(path, f)  # noqa: E731
    parts = []
    for i, s in enumerate(manifest["shards"]):
        if s["n_rows"] == 0:
            continue
        parts.append(
            spark.read.parquet(join(s["file"])).withColumn(
                "__shard_id", F.lit(i)
            )
        )
    if not parts:
        raise ValueError(f"manifest at {path} lists no non-empty shards")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
