"""File-level min/max index + manual data skipping + compaction.

Table formats (Delta/Iceberg) skip files by consulting per-file
column statistics kept in the table's metadata. Plain parquet
directories already CARRY those statistics — in each file's footer —
so the same data skipping is available without a format: build an
index DataFrame of per-file min/max (footers only, no data read),
intersect it with a predicate, and hand the surviving file list back
to the reader. Pays off exactly when the layout is clustered
(`operators/zorder.py::cluster_write`): a z-ordered table gives every
indexed column narrow per-file ranges.

Scale (100 TB, ~100k files): the index build reads FOOTERS ONLY, in
parallel — the file list is parallelized across executors and each
task reads a few KB of metadata per file via pyarrow; there is no
data scan at all. The resulting index is tiny (rows = files x
columns) and is itself a DataFrame: store it, and pruning is a
filter over metadata. The pruned file list does come back to the
driver — it is the read plan, the same thing a table format's driver
computes; at extreme file counts, prune in stages (partition dirs
first).

``compact_small_files`` is the companion maintenance op: many tiny
files (per-micro-batch sinks, over-parallel writes) destroy both scan
throughput (per-file open cost) and skipping (footer count), and the
fix is a periodic width-reduction rewrite.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_INDEX_SCHEMA = (
    "file string, n_rows long, file_size long, file_mtime_ns long, "
    "column string, "
    "min_num double, max_num double, min_str string, max_str string"
)


def _list_parquet_entries(
    spark: SparkSession, path: str
) -> list[tuple[str, int, int]]:
    """(file, size, mtime_ns) per parquet file under ``path``. A
    scheme'd path (``file://``/``s3a://``/``hdfs://`` ...) lists
    through the session's Hadoop FileSystem
    (`sources/hadoopfs.list_files`); scheme-less paths keep the
    driver-local ``os.walk`` fast path.

    The listing is the SINGLE SOURCE of each file's
    (size, mtime_ns) version identity: footer tasks receive these
    values through the plan instead of re-stat'ing, so
    ``update_file_index``'s version keys compare listing-to-listing —
    exact regardless of the store's timestamp granularity (Hadoop
    reports ms, ``os.stat`` ns)."""
    from ..sources import hadoopfs

    if hadoopfs.is_uri(path):
        return [
            (e.path, e.size, e.mtime_ns)
            for e in hadoopfs.list_files(
                spark, path, suffix=".parquet", recursive=True
            )
        ]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                fp = os.path.join(root, f)
                st = os.stat(fp)
                out.append((fp, st.st_size, st.st_mtime_ns))
    return sorted(out)


def _list_parquet_files(path: str, spark: SparkSession | None = None) -> list[str]:
    if spark is not None:
        return [f for f, _sz, _mt in _list_parquet_entries(spark, path)]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _arrow_parquet_file(fname: str):
    """Executor-side open that works on plain paths AND URIs:
    ``file:`` URIs strip to the local path (same bytes, no extra
    layer); other schemes resolve through
    ``pyarrow.fs.FileSystem.from_uri`` (S3/GCS/HDFS when the pyarrow
    build carries the filesystem). Import stays inside the function —
    executor tasks pickle the closure, not the module."""
    import pyarrow.parquet as pq

    if fname.startswith("file:"):
        rest = fname[5:]
        while rest.startswith("//"):
            rest = rest[1:]
        return pq.ParquetFile(rest)
    if "://" in fname:
        from pyarrow import fs as pafs

        fsys, rel = pafs.FileSystem.from_uri(fname)
        return pq.ParquetFile(fsys.open_input_file(rel))
    return pq.ParquetFile(fname)


def build_file_index(
    spark: SparkSession, path: str, cols: list[str],
    footer_batch_files: int = 1024,
) -> DataFrame:
    """Per-(file, column) min/max/row-count from parquet FOOTERS,
    read in parallel on executors (no data scan). Numeric statistics
    land in ``min_num``/``max_num``; byte/string statistics in
    ``min_str``/``max_str``.

    ``footer_batch_files`` chunks the emitted index frames: one Arrow
    task batch can carry an arbitrary slice of the file list, and
    accumulating (files x columns) rows for the whole slice before the
    first yield is the only unbounded buffer in the build — chunking
    caps it at (footer_batch_files x columns) rows regardless of how
    many files land in one task.

    Scheme'd paths (``file://``/``s3a://``/...) list through the
    session's Hadoop FileSystem and footer-read via pyarrow's
    URI-resolved filesystems — see ``_list_parquet_entries`` /
    ``_arrow_parquet_file``."""
    entries = _list_parquet_entries(spark, path)
    if not entries:
        raise FileNotFoundError(f"no parquet files under {path}")
    file_df = spark.createDataFrame(
        entries, "file string, file_size long, file_mtime_ns long"
    ).repartition(min(len(entries), 64))
    return _footer_stats_frame(file_df, cols, footer_batch_files)


def _footer_stats_frame(
    file_df: DataFrame, cols: list[str], footer_batch_files: int
) -> DataFrame:
    """Footer-read core of ``build_file_index``/``update_file_index``:
    per-(file, column) stats for every file in ``file_df``
    (``file string, file_size long, file_mtime_ns long`` — the
    listing's version identity rides the plan so footer rows and
    listings always agree, whatever the store's mtime granularity)."""
    want = list(cols)
    chunk = max(1, int(footer_batch_files))

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols_out = [
            "file", "n_rows", "file_size", "file_mtime_ns", "column",
            "min_num", "max_num", "min_str", "max_str",
        ]
        for pdf in batches:
            rows = []
            for fname, f_size, f_mtime in zip(
                pdf["file"], pdf["file_size"], pdf["file_mtime_ns"]
            ):
                if len(rows) >= chunk * len(want):
                    yield pd.DataFrame(rows, columns=cols_out)
                    rows = []
                # size+mtime identify the file VERSION: an in-place
                # rewrite under the same path must invalidate the
                # stored stats (see ``update_file_index``)
                md = _arrow_parquet_file(fname).metadata
                stats: dict[str, list] = {c: [None, None] for c in want}
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    for ci in range(row_group.num_columns):
                        col = row_group.column(ci)
                        c = col.path_in_schema
                        if c in stats and col.statistics is not None:
                            st = col.statistics
                            lo, hi = stats[c]
                            stats[c] = [
                                st.min if lo is None else min(lo, st.min),
                                st.max if hi is None else max(hi, st.max),
                            ]
                for c, (lo, hi) in stats.items():
                    numeric = isinstance(lo, (int, float)) and not isinstance(
                        lo, bool
                    )
                    rows.append(
                        {
                            "file": fname,
                            "n_rows": md.num_rows,
                            "file_size": int(f_size),
                            "file_mtime_ns": int(f_mtime),
                            "column": c,
                            "min_num": float(lo) if numeric and lo is not None else None,
                            "max_num": float(hi) if numeric and hi is not None else None,
                            "min_str": None if numeric else (None if lo is None else str(lo)),
                            "max_str": None if numeric else (None if hi is None else str(hi)),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols_out)

    return file_df.mapInPandas(read_footers, _INDEX_SCHEMA)


def prune_files_df(
    index: DataFrame, ranges: dict[str, tuple[float, float]]
) -> DataFrame:
    """Surviving files as a one-column DataFrame (``file string``) —
    the DISTRIBUTED form of the read plan: files whose per-column
    [min,max] intersects EVERY predicate range (conjunction). A file
    lacking statistics for a column is conservatively kept.

    Nothing here touches the driver: the predicate evaluation is a
    filter + intersect over the index DataFrame, and callers that can
    consume the plan distributively (``read_pruned(distributed=True)``
    joins it straight into a ``mapInPandas`` read) never materialize a
    file list at all — so pruning has NO scale ceiling beyond the
    index's own size (metadata-tiny even at 100k files)."""
    per_col = []
    for c, (lo, hi) in ranges.items():
        hit = index.filter(
            (F.col("column") == c)
            & (
                F.col("min_num").isNull()
                | ((F.col("max_num") >= lo) & (F.col("min_num") <= hi))
            )
        ).select("file")
        per_col.append(hit)
    plan = per_col[0]
    for other in per_col[1:]:
        plan = plan.intersect(other)
    return plan


def prune_files(
    index: DataFrame, ranges: dict[str, tuple[float, float]],
    max_files: int | None = 1_000_000,
) -> list[str]:
    """Driver-side file list for the pruned read plan (see
    ``prune_files_df`` for the predicate semantics) — what
    ``spark.read.parquet(*files)`` needs, and what a table format's
    driver computes too.

    The list necessarily comes back to the DRIVER, which bounds this
    form at millions of surviving files; ``max_files`` makes the bound
    explicit: the collect is LIMITed to max_files+1 rows (one bounded
    execution — the driver never materializes an oversized list) and
    an over-cap plan raises, pointing at the distributed path
    (``read_pruned(distributed=True)``) which has no such ceiling.
    None disables the guard."""
    plan = prune_files_df(index, ranges)
    if max_files is None:
        return sorted(r.file for r in plan.collect())
    # ONE bounded execution: collect at most max_files+1 rows — the
    # driver never materializes an oversized plan list, and the guard
    # costs no second job
    rows = plan.limit(max_files + 1).collect()
    if len(rows) > max_files:
        raise ValueError(
            f"pruned read plan exceeds max_files={max_files}; use "
            f"read_pruned(..., distributed=True) (the plan stays a "
            f"DataFrame), prune in stages (partition directories "
            f"first), or raise max_files explicitly"
        )
    return sorted(r.file for r in rows)


def read_pruned(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    ranges: dict[str, tuple[float, float]],
    distributed: bool = False,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read only the files surviving the index cut, then apply the
    exact predicate — semantics identical to a full scan + filter
    (pruning is conservative), touching a fraction of the files on a
    clustered layout.

    ``distributed=False`` (default): the surviving file list is
    collected (bounded by ``prune_files``'s guard) and handed to the
    native parquet reader — the fastest path while the plan fits a
    driver list, and the scan keeps full vectorized-reader pushdown.

    ``distributed=True``: the plan NEVER reaches the driver — the
    kept-file DataFrame from ``prune_files_df`` feeds a
    ``mapInPandas`` read where each task pyarrow-reads its assigned
    files (projection pruned to ``columns`` + predicate columns).
    This removes the max_files ceiling entirely: pruning a 100k-file
    index and reading the survivors is one distributed pipeline."""
    base = spark.read.parquet(path)
    need = (
        list(base.columns)
        if columns is None
        else [c for c in base.columns if c in set(columns) | set(ranges)]
    )
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        cond = cond & F.col(c).between(lo, hi)
    if not distributed:
        files = prune_files(index, ranges)
        if not files:
            return base.select(*need).filter(F.lit(False))
        return spark.read.parquet(*files).select(*need).filter(cond)
    schema = base.select(*need).schema
    plan_df = prune_files_df(index, ranges).repartition(64)

    def read_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fname in pdf["file"]:
                pf = _arrow_parquet_file(fname)
                for batch in pf.iter_batches(columns=need):
                    yield batch.to_pandas()[need]

    return plan_df.mapInPandas(read_files, schema).filter(cond)


def compact_small_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a many-small-files dataset into ~target-sized files.
    Width is computed from the on-disk byte total; the rewrite is a
    ``coalesce`` (narrow — no shuffle, preserves any existing sort
    within the merged groups' concatenation order). Returns the file
    count written. Re-cluster with ``cluster_write`` instead when the
    layout itself should change."""
    total = sum(sz for _f, sz, _mt in _list_parquet_entries(spark, src))
    n = max(1, -(-total // target_file_bytes))
    spark.read.parquet(src).coalesce(n).write.mode("overwrite").parquet(dst)
    return n


_RG_INDEX_SCHEMA = (
    "file string, rg int, rg_rows long, column string, "
    "min_num double, max_num double, min_str string, max_str string"
)


def build_rowgroup_index(
    spark: SparkSession, path: str, cols: list[str],
    footer_batch_files: int = 1024,
) -> DataFrame:
    """Per-(file, row_group, column) min/max/row-count — the sub-file
    refinement of ``build_file_index``, from the same footers-only
    parallel read.

    Why a separate granularity: Spark's own parquet scan prunes row
    groups with pushed-down filters, but only AFTER opening each
    file's footer at scan time — at 100k+ files that is 100k+ object
    storage round trips per query even when 99% of files are
    irrelevant. An external row-group index turns the whole read plan
    (which files, which byte ranges) into one metadata filter, the way
    a table format's manifest does, and within a kept multi-GB file it
    names exactly the surviving groups. Index size: files x row-groups
    x columns rows — still metadata-tiny. Scheme'd paths take the
    Hadoop-listing + pyarrow-URI route (``_list_parquet_entries`` /
    ``_arrow_parquet_file``)."""
    files = _list_parquet_files(path, spark)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    want = list(cols)
    chunk = max(1, int(footer_batch_files))

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols_out = [
            "file", "rg", "rg_rows", "column",
            "min_num", "max_num", "min_str", "max_str",
        ]
        for pdf in batches:
            rows = []
            for fname in pdf["file"]:
                if len(rows) >= chunk * len(want):
                    yield pd.DataFrame(rows, columns=cols_out)
                    rows = []
                md = _arrow_parquet_file(fname).metadata
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    stats: dict[str, list] = {c: [None, None] for c in want}
                    for ci in range(row_group.num_columns):
                        col = row_group.column(ci)
                        c = col.path_in_schema
                        if c in stats and col.statistics is not None:
                            stats[c] = [col.statistics.min, col.statistics.max]
                    for c, (lo, hi) in stats.items():
                        numeric = isinstance(
                            lo, (int, float)
                        ) and not isinstance(lo, bool)
                        rows.append(
                            {
                                "file": fname,
                                "rg": rg,
                                "rg_rows": row_group.num_rows,
                                "column": c,
                                "min_num": float(lo)
                                if numeric and lo is not None
                                else None,
                                "max_num": float(hi)
                                if numeric and hi is not None
                                else None,
                                "min_str": None
                                if numeric
                                else (None if lo is None else str(lo)),
                                "max_str": None
                                if numeric
                                else (None if hi is None else str(hi)),
                            }
                        )
            yield pd.DataFrame(rows, columns=cols_out)

    file_df = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 64))
    return file_df.mapInPandas(read_footers, _RG_INDEX_SCHEMA)


def prune_rowgroups_df(
    index: DataFrame, ranges: dict[str, tuple[float, float]]
) -> DataFrame:
    """Surviving (file, rg) pairs as a DataFrame —
    ``prune_files_df`` at row-group granularity. Groups lacking
    statistics for a column are conservatively kept. Fully
    distributed; ``read_pruned_rowgroups`` consumes it without ever
    collecting the plan."""
    per_col = []
    for c, (lo, hi) in ranges.items():
        hit = index.filter(
            (F.col("column") == c)
            & (
                F.col("min_num").isNull()
                | ((F.col("max_num") >= lo) & (F.col("min_num") <= hi))
            )
        ).select("file", "rg")
        per_col.append(hit)
    plan = per_col[0]
    for other in per_col[1:]:
        plan = plan.intersect(other)
    return plan


def prune_rowgroups(
    index: DataFrame, ranges: dict[str, tuple[float, float]],
    max_groups: int | None = 1_000_000,
) -> list[tuple[str, int]]:
    """Driver-side (file, row_group) plan list (see
    ``prune_rowgroups_df`` for the predicate semantics). Same
    driver-side bound discipline as ``prune_files``: one LIMITed
    collect, raise above ``max_groups`` — note the distributed reader
    (``read_pruned_rowgroups``) does NOT go through this list and has
    no such ceiling."""
    plan = prune_rowgroups_df(index, ranges)
    if max_groups is None:
        return sorted((r.file, r.rg) for r in plan.collect())
    rows = plan.limit(max_groups + 1).collect()
    if len(rows) > max_groups:
        raise ValueError(
            f"pruned row-group plan exceeds max_groups={max_groups}; "
            f"use read_pruned_rowgroups (the plan stays a DataFrame), "
            f"prune in stages (partition directories, then files), or "
            f"raise max_groups explicitly"
        )
    return sorted((r.file, r.rg) for r in rows)


def read_pruned_rowgroups(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    ranges: dict[str, tuple[float, float]],
    columns: list[str] | None = None,
) -> DataFrame:
    """Read ONLY the row groups surviving the index cut, then apply
    the exact predicate — semantics identical to full scan + filter.

    The surviving (file, row_group) plan NEVER reaches the driver: it
    stays a DataFrame (``prune_rowgroups_df``) repartitioned straight
    into the reading tasks, and each task range-reads just its
    assigned groups via pyarrow (``read_row_group`` fetches only those
    column chunks' byte ranges) — pruned files are never opened at
    all, kept files surrender only their matching groups, and there is
    no max_groups ceiling. ``columns`` prunes the projection the same
    way (predicate columns are always included)."""
    base = spark.read.parquet(path)
    need = (
        list(base.columns)
        if columns is None
        else [c for c in base.columns if c in set(columns) | set(ranges)]
    )
    schema = base.select(*need).schema
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        cond = cond & F.col(c).between(lo, hi)
    plan_df = prune_rowgroups_df(index, ranges).repartition(64)

    def read_groups(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fname, grp in pdf.groupby("file"):
                pf = _arrow_parquet_file(fname)
                for rg in sorted(grp["rg"]):
                    tbl = pf.read_row_group(int(rg), columns=need)
                    yield tbl.to_pandas()[need]

    return plan_df.mapInPandas(read_groups, schema).filter(cond)


def update_file_index(
    spark: SparkSession, path: str, index: DataFrame, cols: list[str],
    footer_batch_files: int = 1024,
) -> DataFrame:
    """Bring a STORED file index up to date with the directory: footers
    are read only for files the index has not seen, rows for deleted
    files are dropped, everything else is reused as-is. This is how an
    index over a continuously-ingesting 100 TB table stays maintainable
    — per refresh the work is O(new files), never a re-walk of every
    footer (the same append-only discipline as
    ``minhash_lsh_pairs_incremental`` and the CDC snapshot store).

    A file is identified by its (path, size, mtime_ns) VERSION, not
    its path alone: a parquet file rewritten in place under the same
    path changes size and/or mtime, so its stale stats are dropped and
    its footer re-read like a brand-new file's. The diff against the
    stored index is two joins on the version key (semi for survivors,
    anti for arrivals) — no driver-side path list ever enters a plan,
    so the plan size is independent of the file count.

    The current file LISTING still comes from the driver side — the
    same driver-bounded metadata operation as ``prune_files``
    (Hadoop FileSystem for scheme'd paths, ``os.walk`` locally); at
    extreme file counts, list per partition directory. Returns the
    refreshed index (same schema as ``build_file_index``); persist it
    wherever the stored index lives."""
    listing = _list_parquet_entries(spark, path)
    if not listing:
        raise FileNotFoundError(f"no parquet files under {path}")
    on_disk = spark.createDataFrame(
        listing, "file string, file_size long, file_mtime_ns long"
    )
    version_key = ["file", "file_size", "file_mtime_ns"]
    # survivors: index rows whose exact file version is still on disk
    # (an in-place rewrite fails this match and is dropped here)
    kept = index.join(F.broadcast(on_disk), version_key, "left_semi").select(
        *index.columns  # the list-form join moves its keys first
    )
    # arrivals: on-disk versions the index has never footer-read —
    # genuinely new files AND rewritten ones
    new_files = on_disk.join(
        index.select(*version_key).distinct(), version_key, "left_anti"
    ).select(*version_key)
    if new_files.isEmpty():
        return kept
    fresh = _footer_stats_frame(
        new_files.repartition(64), cols, footer_batch_files
    )
    return kept.unionByName(fresh)
