"""Hadoop FileSystem route for manifest/footer IO — exercised on
``file:///`` URIs: the scheme goes through the exact same
``FileSystem.get(conf)`` API boundary as ``s3a://``/``hdfs://``
(provider resolution is the Hadoop configuration's job), so these
tests certify the route itself without needing an object store in the
container."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from impala_hashset_count_spark.sources import hadoopfs


def test_is_uri():
    assert hadoopfs.is_uri("file:///tmp/x")
    assert hadoopfs.is_uri("s3a://bucket/key")
    assert not hadoopfs.is_uri("/tmp/x")
    assert not hadoopfs.is_uri("relative/path")


def test_list_read_write_roundtrip(spark, tmp_path):
    base = tmp_path / "hfs"
    base.mkdir()
    (base / "sub").mkdir()
    (base / "a.parquet").write_bytes(b"xx")
    (base / "sub" / "b.parquet").write_bytes(b"yyyy")
    (base / "c.txt").write_bytes(b"zz")
    uri = f"file://{base}"

    all_files = hadoopfs.list_files(spark, uri, recursive=True)
    names = [e.path.rsplit("/", 1)[1] for e in all_files]
    # sorted by FULL path: the sub/ file sorts after the top-level ones
    assert names == ["a.parquet", "c.txt", "b.parquet"]

    pq_only = hadoopfs.list_files(spark, uri, suffix=".parquet")
    assert [e.path.rsplit("/", 1)[1] for e in pq_only] == [
        "a.parquet", "b.parquet",
    ]
    by_name = {e.path.rsplit("/", 1)[1]: e for e in pq_only}
    assert by_name["a.parquet"].size == 2
    assert by_name["b.parquet"].size == 4
    # Hadoop reports ms; the ns field is the ms value scaled
    assert by_name["a.parquet"].mtime_ns % 1_000_000 == 0

    top_only = hadoopfs.list_files(spark, uri, recursive=False)
    assert [e.path.rsplit("/", 1)[1] for e in top_only] == [
        "a.parquet", "c.txt",
    ]

    assert hadoopfs.read_bytes(spark, f"{uri}/sub/b.parquet") == b"yyyy"
    assert hadoopfs.exists(spark, f"{uri}/a.parquet")
    assert not hadoopfs.exists(spark, f"{uri}/nope")

    hadoopfs.write_bytes(spark, f"{uri}/m.json", b'{"k": 1}')
    assert json.loads((base / "m.json").read_bytes()) == {"k": 1}
    # overwrite replaces
    hadoopfs.write_bytes(spark, f"{uri}/m.json", b'{"k": 2}')
    assert json.loads((base / "m.json").read_bytes()) == {"k": 2}


def test_read_parquet_metadata_footer_only(spark, tmp_path):
    """Footer-route metadata equals the local pyarrow read —
    row counts, row-group structure, and per-column statistics."""
    p = tmp_path / "t.parquet"
    t = pa.table(
        {"a": list(range(1000)), "b": [f"s{i:04d}" for i in range(1000)]}
    )
    pq.write_table(t, p, row_group_size=300)

    md = hadoopfs.read_parquet_metadata(spark, f"file://{p}")
    ref = pq.ParquetFile(str(p)).metadata
    assert md.num_rows == ref.num_rows == 1000
    assert md.num_row_groups == ref.num_row_groups == 4
    for rg in range(ref.num_row_groups):
        for ci in range(ref.row_group(rg).num_columns):
            a = md.row_group(rg).column(ci).statistics
            b = ref.row_group(rg).column(ci).statistics
            assert (a.min, a.max, a.null_count) == (b.min, b.max, b.null_count)

    with pytest.raises(ValueError, match="magic"):
        bad = tmp_path / "bad.parquet"
        bad.write_bytes(b"not a parquet file!!")
        hadoopfs.read_parquet_metadata(spark, f"file://{bad}")


def test_training_shards_hadoop_route_matches_local(spark, tmp_path):
    """write/read_training_shards over a file:/// URI produce the
    same manifest contents and the same global order as the local-path
    route — the two routes are interchangeable."""
    from impala_hashset_count_spark.sources.ingest import (
        read_training_shards,
        write_training_shards,
    )

    df = spark.range(0, 500).selectExpr(
        "id", "concat('doc_', id) AS doc", "id % 7 AS grp"
    )
    local_dir = str(tmp_path / "local_shards")
    uri_dir = f"file://{tmp_path}/uri_shards"

    m_local = write_training_shards(df, local_dir, "doc", seed="e1", n_shards=4)
    m_uri = write_training_shards(df, uri_dir, "doc", seed="e1", n_shards=4)

    # identical logical manifests (file names differ by task UUID only)
    assert m_local["n_rows"] == m_uri["n_rows"] == 500
    assert [s["n_rows"] for s in m_local["shards"]] == [
        s["n_rows"] for s in m_uri["shards"]
    ]
    assert [
        (s["key_min"], s["key_max"]) for s in m_local["shards"]
    ] == [(s["key_min"], s["key_max"]) for s in m_uri["shards"]]
    # manifest.json physically present at the URI path
    assert json.loads(
        hadoopfs.read_bytes(spark, f"{uri_dir}/manifest.json")
    )["n_rows"] == 500

    order_local = [
        r.id
        for r in read_training_shards(spark, local_dir)
        .orderBy("__shard_id", "__shuffle_key")
        .collect()
    ]
    order_uri = [
        r.id
        for r in read_training_shards(spark, uri_dir)
        .orderBy("__shard_id", "__shuffle_key")
        .collect()
    ]
    assert order_local == order_uri
    assert sorted(order_local) == list(range(500))


def test_file_index_hadoop_route_matches_local(spark, tmp_path):
    """build_file_index / build_rowgroup_index / update_file_index
    over a file:/// URI: same stats as the local walk, distributed
    pruned read works, and the refresh's version identity is stable
    (zero re-reads on an unchanged directory)."""
    from impala_hashset_count_spark.operators.fileindex import (
        build_file_index,
        build_rowgroup_index,
        prune_files,
        read_pruned,
        update_file_index,
    )

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for i in range(4):
        t = pa.table(
            {
                "k": list(range(i * 100, (i + 1) * 100)),
                "v": [f"v{j}" for j in range(100)],
            }
        )
        pq.write_table(t, data_dir / f"part{i}.parquet")
    uri = f"file://{data_dir}"

    idx_local = build_file_index(spark, str(data_dir), ["k"])
    idx_uri = build_file_index(spark, uri, ["k"])

    def stats(df):
        return sorted(
            (r.file.rsplit("/", 1)[1], r.column, r.min_num, r.max_num, r.n_rows)
            for r in df.collect()
        )

    assert stats(idx_local) == stats(idx_uri)

    kept = prune_files(idx_uri, {"k": (150, 250)})
    assert sorted(f.rsplit("/", 1)[1] for f in kept) == [
        "part1.parquet", "part2.parquet",
    ]

    # both reader forms work on URI paths end to end
    got = read_pruned(spark, uri, idx_uri, {"k": (150, 250)})
    assert sorted(r.k for r in got.collect()) == list(range(150, 251))
    got_d = read_pruned(
        spark, uri, idx_uri, {"k": (150, 250)}, distributed=True
    )
    assert sorted(r.k for r in got_d.collect()) == list(range(150, 251))

    rg_local = build_rowgroup_index(spark, str(data_dir), ["k"])
    rg_uri = build_rowgroup_index(spark, uri, ["k"])
    assert sorted(
        (r.file.rsplit("/", 1)[1], r.rg, r.min_num, r.max_num)
        for r in rg_local.collect()
    ) == sorted(
        (r.file.rsplit("/", 1)[1], r.rg, r.min_num, r.max_num)
        for r in rg_uri.collect()
    )

    # refresh on an UNCHANGED dir: listing-sourced version identity
    # must match the stored rows exactly -> same index back
    refreshed = update_file_index(spark, uri, idx_uri, ["k"])
    assert stats(refreshed) == stats(idx_uri)

    # rewrite one file in place -> exactly its rows refresh
    t = pa.table({"k": [9999], "v": ["new"]})
    pq.write_table(t, data_dir / "part0.parquet")
    os.utime(data_dir / "part0.parquet")
    refreshed2 = update_file_index(spark, uri, refreshed, ["k"])
    by_file = {
        r.file.rsplit("/", 1)[1]: (r.min_num, r.max_num)
        for r in refreshed2.filter("column = 'k'").collect()
    }
    assert by_file["part0.parquet"] == (9999.0, 9999.0)
    assert by_file["part1.parquet"] == (100.0, 199.0)
