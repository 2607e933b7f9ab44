"""Z-order clustering + data-skipping payoff (`operators/zorder.py`)."""

import glob
import os

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.zorder import (
    cluster_write,
    interleave_bits,
    normalize_to_bits,
    zorder_key,
    zorder_sql,
)


def _py_morton(ns, bits):
    z = 0
    for j, n in enumerate(ns):
        for i in range(bits):
            z |= ((n >> i) & 1) << (i * len(ns) + j)
    return z


def test_interleave_matches_python(spark):
    rows = [(3, 5), (0, 0), (65535, 1), (1234, 4321), (65535, 65535)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = [
        r.z
        for r in df.select(
            interleave_bits([F.col("a"), F.col("b")], 16).alias("z")
        ).collect()
    ]
    assert got == [_py_morton(r, 16) for r in rows]


def test_interleave_rejects_long_overflow(spark):
    with pytest.raises(ValueError):
        interleave_bits([F.lit(1)] * 4, 16)


def test_zorder_sql_mirrors_spark(spark, sf_small):
    """The generated SQL text computes the identical Morton key on
    DuckDB — engine-portable layout keys."""
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    joined, z = zorder_key(li, ["l_partkey", "l_suppkey"], bits=12)
    got = sorted(
        map(
            tuple,
            joined.select(F.col("l_orderkey"), F.col("l_linenumber"), z.alias("z"))
            .collect(),
        )
    )
    con = duckdb.connect()
    expr = zorder_sql(
        ["l_partkey", "l_suppkey"],
        ["(SELECT MIN(l_partkey) FROM li)", "(SELECT MIN(l_suppkey) FROM li)"],
        ["(SELECT MAX(l_partkey) FROM li)", "(SELECT MAX(l_suppkey) FROM li)"],
        bits=12,
    )
    con.execute(
        f"CREATE VIEW li AS SELECT * FROM read_parquet('{sf_small}/lineitem.parquet')"
    )
    oracle = sorted(
        con.execute(
            f"SELECT l_orderkey, l_linenumber, {expr} AS z FROM li"
        ).fetchall()
    )
    assert got == oracle


def test_constant_column_span_zero(spark):
    df = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], ["a", "b"])
    joined, z = zorder_key(df, ["a", "b"], bits=8)
    vals = [r.z for r in joined.select(z.alias("z")).collect()]
    assert len(set(vals)) == 3  # 'a' still discriminates; 'b' contributes 0


def _file_stats(path, cols):
    boxes = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        boxes.append((lo, hi))
    return boxes


def _avg_bbox_area(boxes, cols, spans):
    areas = []
    for lo, hi in boxes:
        a = 1.0
        for c in cols:
            a *= (hi[c] - lo[c]) / spans[c]
        areas.append(a)
    return sum(areas) / len(areas)


def test_cluster_write_shrinks_bboxes_and_skips_files(spark, sf_small, tmp_path):
    """The mechanical payoff: per-file min/max bounding boxes are far
    smaller than under the natural row order, and a 2-D range predicate
    intersects a minority of clustered files (file skipping)."""
    cols = ["l_partkey", "l_suppkey"]
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    n_files = 8
    zpath = os.path.join(str(tmp_path), "zorder")
    npath = os.path.join(str(tmp_path), "natural")
    cluster_write(li, cols, zpath, n_files=n_files, bits=16)
    li.repartition(n_files).write.parquet(npath)

    spans = {
        c: v
        for c, v in zip(
            cols,
            li.agg(
                *[(F.max(c) - F.min(c)).cast("double") for c in cols]
            ).first(),
        )
    }
    zboxes = _file_stats(zpath, cols)
    nboxes = _file_stats(npath, cols)
    assert len(zboxes) == n_files
    z_area = _avg_bbox_area(zboxes, cols, spans)
    n_area = _avg_bbox_area(nboxes, cols, spans)
    # Natural order covers ~the full space per file; z-order must cut
    # the average bounding box dramatically.
    assert z_area < 0.5 * n_area, (z_area, n_area)

    # File skipping for a 2-D range predicate. A corner window (5%-25%
    # of each span) — a central one would straddle the z-curve's
    # top-level split boundary in both dimensions and touch every
    # child range for free.
    mins = li.agg(*[F.min(c) for c in cols]).first()
    maxs = li.agg(*[F.max(c) for c in cols]).first()
    window = {
        c: (
            mins[i] + 0.05 * (maxs[i] - mins[i]),
            mins[i] + 0.25 * (maxs[i] - mins[i]),
        )
        for i, c in enumerate(cols)
    }

    def hits(boxes):
        n = 0
        for lo, hi in boxes:
            if all(
                hi[c] >= window[c][0] and lo[c] <= window[c][1] for c in cols
            ):
                n += 1
        return n

    assert hits(zboxes) < hits(nboxes)
    assert hits(zboxes) <= n_files // 2

    # Clustering relays the data unchanged.
    assert (
        spark.read.parquet(zpath).count() == li.count()
    )


def test_interleave_three_columns(spark):
    rows = [(1, 2, 3), (255, 0, 255), (7, 7, 7)]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    got = [
        r.z
        for r in df.select(
            interleave_bits([F.col("a"), F.col("b"), F.col("c")], 8).alias("z")
        ).collect()
    ]
    assert got == [_py_morton(r, 8) for r in rows]
