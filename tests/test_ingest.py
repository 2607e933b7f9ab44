"""Heterogeneous-schema union + training-shard export
(`sources/ingest.py`)."""

import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.sources.ingest import (
    harmonize_schemas,
    read_training_shards,
    write_training_shards,
)
from impala_hashset_count_spark.sources.tables import load_table


def test_harmonize_widens_and_fills(spark):
    a = spark.createDataFrame([(1, "x", 1.5)], "id int, name string, score double")
    b = spark.createDataFrame([(2, 10)], "id bigint, extra int")
    c = spark.createDataFrame([("3", None)], "id string, name string")
    out = harmonize_schemas([a, b, c])
    # first-appearance column order; id widened int->bigint->string
    assert out.columns == ["id", "name", "score", "extra"]
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types == {
        "id": "string", "name": "string", "score": "double", "extra": "int"
    }
    rows = sorted(map(tuple, out.collect()), key=str)
    assert rows == sorted(
        [("1", "x", 1.5, None), ("2", None, None, 10), ("3", None, None, None)],
        key=str,
    )


def test_harmonize_numeric_ladder_only_widens(spark):
    a = spark.createDataFrame([(1,)], "v tinyint")
    b = spark.createDataFrame([(2,)], "v bigint")
    c = spark.createDataFrame([(3.5,)], "v float")
    out = harmonize_schemas([a, b, c])
    # bigint + float -> double (the widest touched rung)
    assert out.schema.fields[0].dataType.simpleString() == "double"
    assert sorted(r.v for r in out.collect()) == [1.0, 2.0, 3.5]


def test_harmonize_strict_raises_on_non_numeric_conflict(spark):
    a = spark.createDataFrame([(1,)], "v int")
    b = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(TypeError, match="strict"):
        harmonize_schemas([a, b], strict=True)
    # widen mode stringifies instead
    out = harmonize_schemas([a, b])
    assert out.schema.fields[0].dataType.simpleString() == "string"


def test_harmonize_complex_type_mismatch_always_raises(spark):
    a = spark.createDataFrame([([1],)], "v array<int>")
    b = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(TypeError, match="complex"):
        harmonize_schemas([a, b])
    with pytest.raises(TypeError, match="complex"):
        harmonize_schemas([b, a], strict=True)


def test_training_shards_manifest_order_is_global_shuffle_order(
    spark, sf_small, tmp_path
):
    from impala_hashset_count_spark.operators.sampling import shuffle_rows

    d = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(d, path, "doc_id", seed="ep1", n_shards=8)
    assert manifest["n_rows"] == d.count()
    # shard key ranges are non-overlapping and ascending in manifest order
    prev_hi = ""
    for s in manifest["shards"]:
        if s["n_rows"] == 0:
            continue
        assert s["key_min"] <= s["key_max"]
        assert s["key_min"] >= prev_hi
        prev_hi = s["key_max"]
    # reading shards in manifest order reproduces the epoch's global order
    got = [
        r.doc_id
        for r in read_training_shards(spark, path)
        .orderBy("__shard_id", "__shuffle_key")
        .collect()
    ]
    want = [
        r.doc_id
        for r in shuffle_rows(d, "doc_id", seed="ep1", n_shards=8, keep_key=True)
        .withColumn("__pid", F.spark_partition_id())
        .orderBy("__pid", "__shuffle_key")
        .collect()
    ]
    assert got == want
    # a replay reproduces identical contents/boundaries/counts (file
    # names carry the write's task UUIDs and legitimately differ)
    manifest2 = write_training_shards(d, path, "doc_id", seed="ep1", n_shards=8)
    strip = lambda m: [  # noqa: E731
        {k: v for k, v in s.items() if k != "file"} for s in m["shards"]
    ]
    assert strip(manifest2) == strip(manifest)
    # a different seed re-deals the order
    m3 = write_training_shards(
        d, str(tmp_path / "shards2"), "doc_id", seed="ep2", n_shards=8
    )
    got2 = [
        r.doc_id
        for r in read_training_shards(spark, str(tmp_path / "shards2"))
        .orderBy("__shard_id", "__shuffle_key")
        .collect()
    ]
    assert m3["n_rows"] == manifest["n_rows"] and got2 != got
