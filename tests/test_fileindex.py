"""Footer-based file index, data skipping, compaction
(`operators/fileindex.py`)."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.fileindex import (
    build_file_index,
    compact_small_files,
    prune_files,
    read_pruned,
)
from impala_hashset_count_spark.operators.zorder import cluster_write
from impala_hashset_count_spark.session import ship_package


def _zcluster(spark, sf_small, tmp_path, n_files=8):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    path = os.path.join(str(tmp_path), "zli")
    cluster_write(li, ["l_partkey", "l_suppkey"], path, n_files=n_files)
    return li, path


def test_index_matches_direct_footer_read(spark, sf_small, tmp_path):
    ship_package(spark)
    _, path = _zcluster(spark, sf_small, tmp_path)
    idx = build_file_index(spark, path, ["l_partkey", "l_suppkey"]).collect()
    got = {
        (r.file, r.column): (r.min_num, r.max_num, r.n_rows) for r in idx
    }
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for c in ("l_partkey", "l_suppkey"):
            lo = hi = None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema == c and col.statistics is not None:
                        st = col.statistics
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
            assert got[(f, c)] == (float(lo), float(hi), md.num_rows)


def test_read_pruned_equals_full_scan_and_skips(spark, sf_small, tmp_path):
    ship_package(spark)
    li, path = _zcluster(spark, sf_small, tmp_path)
    idx = build_file_index(spark, path, ["l_partkey", "l_suppkey"])

    mins = li.agg(F.min("l_partkey"), F.min("l_suppkey")).first()
    maxs = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
    ranges = {
        "l_partkey": (
            mins[0] + 0.05 * (maxs[0] - mins[0]),
            mins[0] + 0.25 * (maxs[0] - mins[0]),
        ),
        "l_suppkey": (
            mins[1] + 0.05 * (maxs[1] - mins[1]),
            mins[1] + 0.25 * (maxs[1] - mins[1]),
        ),
    }
    kept = prune_files(idx, ranges)
    assert 0 < len(kept) < 8  # genuine skipping on the clustered layout

    got = sorted(
        map(tuple, read_pruned(spark, path, idx, ranges).collect())
    )
    cond = F.col("l_partkey").between(*ranges["l_partkey"]) & F.col(
        "l_suppkey"
    ).between(*ranges["l_suppkey"])
    expect = sorted(map(tuple, spark.read.parquet(path).filter(cond).collect()))
    assert got == expect and len(got) > 0


def test_prune_conservative_on_missing_column_stats(spark, tmp_path):
    ship_package(spark)
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "k long, v double")
    path = os.path.join(str(tmp_path), "plain")
    df.repartition(4).write.parquet(path)
    idx = build_file_index(spark, path, ["v"])
    # unclustered: every file spans ~the full range; a mid-range cut keeps all
    kept = prune_files(idx, {"v": (40.0, 60.0)})
    assert len(kept) == 4


def test_empty_prune_returns_empty_frame(spark, sf_small, tmp_path):
    ship_package(spark)
    _, path = _zcluster(spark, sf_small, tmp_path)
    idx = build_file_index(spark, path, ["l_partkey"])
    out = read_pruned(spark, path, idx, {"l_partkey": (1e12, 2e12)})
    assert out.count() == 0


def test_compact_small_files_roundtrip(spark, sf_small, tmp_path):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    src = os.path.join(str(tmp_path), "many")
    dst = os.path.join(str(tmp_path), "few")
    orders.repartition(64).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 64
    n = compact_small_files(spark, src, dst, target_file_bytes=1 << 30)
    written = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(written) == n == 1
    assert sorted(map(tuple, spark.read.parquet(dst).collect())) == sorted(
        map(tuple, orders.collect())
    )


def test_footer_batch_chunking_yields_identical_index(spark, sf_small, tmp_path):
    """footer_batch_files=1 (maximal chunking — one yield per file)
    must produce exactly the same index rows as the default: the chunk
    size is a memory bound, never a semantic knob."""
    ship_package(spark)
    _, path = _zcluster(spark, sf_small, tmp_path)
    cols = ["l_partkey", "l_suppkey"]
    base = sorted(map(tuple, build_file_index(spark, path, cols).collect()))
    chunked = sorted(
        map(tuple, build_file_index(
            spark, path, cols, footer_batch_files=1
        ).collect())
    )
    assert base == chunked


def test_prune_max_files_guard_raises_with_remedy(spark, sf_small, tmp_path):
    """The driver-side read-plan bound: a surviving plan larger than
    max_files must raise (with the staged-pruning remedy) instead of
    materializing an unbounded driver list; None disables the guard."""
    import pytest

    ship_package(spark)
    _, path = _zcluster(spark, sf_small, tmp_path)
    idx = build_file_index(spark, path, ["l_partkey"])
    wide = {"l_partkey": (float("-inf"), float("inf"))}
    with pytest.raises(ValueError, match="prune in stages"):
        prune_files(idx, wide, max_files=1)
    kept = prune_files(idx, wide, max_files=None)
    assert len(kept) > 1


def _multi_rg_layout(spark, sf_small, tmp_path):
    """Two files sorted by l_orderkey with ~64 KB row groups — several
    narrow-range row groups per file."""
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    path = os.path.join(str(tmp_path), "rgli")
    (
        li.orderBy("l_orderkey")
        .coalesce(2)
        .write.option("parquet.block.size", 65536)
        .mode("overwrite")
        .parquet(path)
    )
    return li, path


def test_rowgroup_index_matches_direct_footer_read(spark, sf_small, tmp_path):
    from impala_hashset_count_spark.operators.fileindex import (
        build_rowgroup_index,
    )

    ship_package(spark)
    _, path = _multi_rg_layout(spark, sf_small, tmp_path)
    idx = build_rowgroup_index(spark, path, ["l_orderkey"]).collect()
    got = {(r.file, r.rg): (r.min_num, r.max_num, r.rg_rows) for r in idx}
    total_rgs = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        total_rgs += md.num_row_groups
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema == "l_orderkey":
                    st = col.statistics
                    assert got[(f, rg)] == (
                        float(st.min),
                        float(st.max),
                        row_group.num_rows,
                    )
    assert total_rgs > 2  # the layout really has sub-file granularity
    assert len(got) == total_rgs


def test_read_pruned_rowgroups_equals_full_scan_and_skips_within_files(
    spark, sf_small, tmp_path
):
    from impala_hashset_count_spark.operators.fileindex import (
        build_rowgroup_index,
        prune_rowgroups,
        read_pruned_rowgroups,
    )

    ship_package(spark)
    li, path = _multi_rg_layout(spark, sf_small, tmp_path)
    idx = build_rowgroup_index(spark, path, ["l_orderkey"]).localCheckpoint()
    total_rgs = idx.select("file", "rg").distinct().count()

    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    ranges = {"l_orderkey": (lo + 0.3 * (hi - lo), lo + 0.45 * (hi - lo))}
    plan = prune_rowgroups(idx, ranges)
    # genuine SUB-FILE skipping: fewer groups than exist, and at least
    # one kept file contributes only a strict subset of its groups
    assert 0 < len(plan) < total_rgs
    per_file_total = {
        r.file: r.n for r in idx.groupBy("file").agg(
            F.countDistinct("rg").alias("n")
        ).collect()
    }
    kept_per_file: dict[str, int] = {}
    for f, _rg in plan:
        kept_per_file[f] = kept_per_file.get(f, 0) + 1
    assert any(kept_per_file[f] < per_file_total[f] for f in kept_per_file)

    got = sorted(
        map(tuple, read_pruned_rowgroups(spark, path, idx, ranges).collect())
    )
    cond = F.col("l_orderkey").between(*ranges["l_orderkey"])
    expect = sorted(
        map(tuple, spark.read.parquet(path).filter(cond).collect())
    )
    assert got == expect and len(got) > 0


def test_read_pruned_rowgroups_projection_and_empty_plan(
    spark, sf_small, tmp_path
):
    from impala_hashset_count_spark.operators.fileindex import (
        build_rowgroup_index,
        read_pruned_rowgroups,
    )

    ship_package(spark)
    li, path = _multi_rg_layout(spark, sf_small, tmp_path)
    idx = build_rowgroup_index(spark, path, ["l_orderkey"]).localCheckpoint()
    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()

    # projection: predicate column joins the requested columns
    ranges = {"l_orderkey": (lo, lo + 0.1 * (hi - lo))}
    out = read_pruned_rowgroups(
        spark, path, idx, ranges, columns=["l_quantity"]
    )
    assert set(out.columns) == {"l_orderkey", "l_quantity"}
    assert out.count() == spark.read.parquet(path).filter(
        F.col("l_orderkey").between(*ranges["l_orderkey"])
    ).count()

    # a range beyond the data prunes everything -> empty, same schema
    empty = read_pruned_rowgroups(
        spark, path, idx, {"l_orderkey": (hi + 10, hi + 20)}
    )
    assert empty.count() == 0
    assert empty.columns == spark.read.parquet(path).columns


def test_update_file_index_incremental_equals_fresh_build(
    spark, sf_small, tmp_path
):
    from impala_hashset_count_spark.operators.fileindex import (
        build_file_index,
        update_file_index,
    )

    ship_package(spark)
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    path = os.path.join(str(tmp_path), "inc")
    li.limit(2000).coalesce(2).write.parquet(path)
    idx0 = build_file_index(spark, path, ["l_orderkey"]).localCheckpoint()

    # append two more files, delete one ORIGINAL (indexed) file
    li.limit(1000).coalesce(2).write.mode("append").parquet(path)
    victim = sorted({r.file for r in idx0.collect()})[0]
    os.remove(victim)

    updated = update_file_index(spark, path, idx0, ["l_orderkey"])
    fresh = build_file_index(spark, path, ["l_orderkey"])
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert canon(updated) == canon(fresh)
    assert not any(r.file == victim for r in updated.collect())

    # no new files: the stored rows come back verbatim
    again = update_file_index(spark, path, updated, ["l_orderkey"])
    assert canon(again) == canon(updated)


def test_stream_index_maintenance_live_and_replay_safe(spark, tmp_path):
    """LIVE continuous index maintenance: two real micro-batches land
    as idempotent batch partitions while the stored footer index
    advances one version per batch with O(batch files) work; the final
    index equals a fresh full rebuild, pruning against it matches a
    direct scan, and a replayed run (fresh checkpoint, same source)
    converges to the same state instead of duplicating rows."""
    from impala_hashset_count_spark.operators.fileindex import (
        build_file_index,
        prune_files,
    )
    from impala_hashset_count_spark.streaming.windows import (
        read_snapshot,
        stream_index_maintenance,
    )

    ship_package(spark)
    schema = "k bigint, v bigint"
    src = str(tmp_path / "ix_src")
    data = str(tmp_path / "ix_data")
    ixp = str(tmp_path / "ix_idx")
    b1 = [(i, i * 10) for i in range(100)]
    b2 = [(i, i * 10) for i in range(100, 160)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    def drain(ck):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = stream_index_maintenance(stream, data, ixp, ck, ["k"])
        q.processAllAvailable()
        q.stop()

    drain(str(tmp_path / "ix_ck1"))

    # the maintained index == a fresh rebuild of everything on disk
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    latest = read_snapshot(spark, ixp)
    assert canon(latest) == canon(build_file_index(spark, data, ["k"]))

    # pruning against the maintained index matches a direct scan
    kept = prune_files(latest, {"k": (120.0, 140.0)})
    got = (
        spark.read.parquet(*kept)
        .filter(F.col("k").between(120, 140))
        .count()
    )
    assert got == 21
    # and it really skipped the batch whose range misses the predicate
    assert len(kept) < len(
        {r.file for r in latest.select("file").distinct().collect()}
    )

    # the ingested data itself round-trips
    assert sorted(
        (r.k, r.v) for r in spark.read.parquet(data).collect()
    ) == sorted(b1 + b2)

    # replay with a fresh checkpoint: same final data + index state
    drain(str(tmp_path / "ix_ck2"))
    assert sorted(
        (r.k, r.v) for r in spark.read.parquet(data).collect()
    ) == sorted(b1 + b2)
    latest2 = read_snapshot(spark, ixp)
    assert canon(latest2) == canon(build_file_index(spark, data, ["k"]))


def test_update_file_index_detects_in_place_rewrite(
    spark, sf_small, tmp_path
):
    """A parquet file rewritten IN PLACE under the same path must not
    keep its stale stats: the index identifies files by
    (path, size, mtime_ns), so the rewritten version is re-footer-read
    and the refreshed index equals a fresh build."""
    from impala_hashset_count_spark.operators.fileindex import (
        update_file_index,
    )

    ship_package(spark)
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    path = os.path.join(str(tmp_path), "rw")
    li.limit(500).coalesce(1).write.parquet(path)
    idx0 = build_file_index(spark, path, ["l_orderkey"]).localCheckpoint()
    victim = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]

    # rewrite the same path with DIFFERENT data (wider key range)
    stage = os.path.join(str(tmp_path), "rw_stage")
    li.orderBy(F.desc("l_orderkey")).limit(700).coalesce(1).write.parquet(
        stage
    )
    src = sorted(glob.glob(os.path.join(stage, "*.parquet")))[0]
    os.replace(src, victim)

    updated = update_file_index(spark, path, idx0, ["l_orderkey"])
    fresh = build_file_index(spark, path, ["l_orderkey"])
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert canon(updated) == canon(fresh)
    # and the stale stats are really gone: row count reflects the
    # rewrite, not the original write
    (row,) = updated.filter(F.col("file") == victim).collect()
    assert row.n_rows == 700


def test_read_pruned_distributed_equals_driver_path(
    spark, sf_small, tmp_path
):
    """distributed=True (plan never collected) returns exactly the
    same rows as the driver-list path and the full scan + filter."""
    ship_package(spark)
    li, path = _zcluster(spark, sf_small, tmp_path)
    idx = build_file_index(spark, path, ["l_partkey", "l_suppkey"])
    ranges = {"l_partkey": (10.0, 40.0), "l_suppkey": (1.0, 5.0)}
    cond = F.col("l_partkey").between(10, 40) & F.col("l_suppkey").between(
        1, 5
    )
    want = sorted(map(tuple, li.filter(cond).collect()))
    driver = sorted(
        map(tuple, read_pruned(spark, path, idx, ranges).collect())
    )
    dist = sorted(
        map(
            tuple,
            read_pruned(
                spark, path, idx, ranges, distributed=True
            ).collect(),
        )
    )
    assert driver == want
    assert dist == want
    # projection pruning on the distributed path
    cols = sorted(
        read_pruned(
            spark, path, idx, ranges, distributed=True,
            columns=["l_orderkey"],
        ).columns
    )
    assert cols == sorted({"l_orderkey", "l_partkey", "l_suppkey"})


def test_distributed_prune_has_no_file_count_ceiling(spark):
    """A 100k-file synthetic index prunes through the DataFrame path
    with no staged-pruning error (the old driver-list ceiling): the
    plan stays distributed and only an aggregate of it is observed."""
    from impala_hashset_count_spark.operators.fileindex import (
        prune_files_df,
    )

    n = 100_000
    idx = spark.range(n).select(
        F.concat(F.lit("f"), F.col("id")).alias("file"),
        F.lit(100).cast("long").alias("n_rows"),
        F.lit(1).cast("long").alias("file_size"),
        F.lit(1).cast("long").alias("file_mtime_ns"),
        F.lit("k").alias("column"),
        (F.col("id") * 10.0).alias("min_num"),
        (F.col("id") * 10.0 + 9.0).alias("max_num"),
        F.lit(None).cast("string").alias("min_str"),
        F.lit(None).cast("string").alias("max_str"),
    )
    # a predicate wide enough that >99% of files survive: the old
    # driver-list path would raise at max_files=1000; the DataFrame
    # plan does not care
    plan = prune_files_df(idx, {"k": (0.0, 10.0 * n)})
    assert plan.count() == n

    import pytest

    with pytest.raises(ValueError, match="distributed=True"):
        prune_files(idx, {"k": (0.0, 10.0 * n)}, max_files=1000)
