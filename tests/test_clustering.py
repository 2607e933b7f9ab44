"""Deterministic quantized k-means (`operators/clustering.py`) and the
SemDeDup cluster-then-dedup composition.

The contract under test is the one the driver hash enforces on the
`sd_*` arms of `dedup_embedding_cosine`: Spark and the generated
DuckDB CTE chain must agree value-for-value on seeds, every
intermediate centroid, every assignment and its exact integer
distance — plus the operator-level edge rules (distance ties go to
the smallest cluster index; an emptied cluster keeps its previous
centroid) and the semantic behavior on a planted near-dup corpus.
"""

import collections

import duckdb
import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.clustering import (
    kmeans_assign,
    kmeans_oracle_ctes,
    kmeans_quantized,
    kmeans_seeds,
    quantized_vec,
    semdedup_drops,
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    path = f"{sf_dir}/embeddings.parquet"
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
    )
    return con


def test_spark_duckdb_mirror_exact(spark, sf_small):
    """Assignments, distances AND all k x dim final centroid
    components are bit-identical across engines."""
    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    assign, cents = kmeans_quantized(e, "vec_id", "embedding", k=8, iters=3)
    srows = {
        r["vec_id"]: (r["cluster"], r["dist"]) for r in assign.collect()
    }

    con = _duck(sf_small)
    ctes, final = kmeans_oracle_ctes(k=8, iters=3)
    drows = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"WITH {ctes} SELECT vec_id, c, CAST(dist AS BIGINT) "
            f"FROM {final}"
        ).fetchall()
    }
    assert srows == drows
    dcent = collections.defaultdict(dict)
    for c, d, v in con.execute(
        f"WITH {ctes} SELECT c, d, v FROM __km_cent3"
    ).fetchall():
        dcent[c][d] = v
    for c in range(8):
        assert [dcent[c][d + 1] for d in range(64)] == cents[c]


def test_assignment_partitioning_invariant(spark, sf_small):
    """The result must not depend on the physical partitioning — the
    distributed-Lloyd sync points (seed collect, centroid update) are
    exact-arithmetic, so any partition layout folds to the same state."""
    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    a1, c1 = kmeans_quantized(e, "vec_id", "embedding", k=4, iters=2)
    a2, c2 = kmeans_quantized(
        e.repartition(13, "label"), "vec_id", "embedding", k=4, iters=2
    )
    assert c1 == c2
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_tie_breaks_to_smallest_cluster(spark):
    """A point equidistant from two centroids lands in the LOWER
    cluster index on both engines (array_position first-occurrence on
    the Spark side; ORDER BY dist, c on the oracle side)."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    ).withColumn("__q", quantized_vec("embedding"))
    cents = [[-4, 0], [4, 0]]  # exactly equidistant from the origin
    row = kmeans_assign(df, "__q", cents).first()
    assert row["cluster"] == 0 and row["dist"] == 16


def test_empty_cluster_keeps_previous_centroid(spark):
    """When an iteration empties a cluster, its centroid must carry
    over unchanged (both engines) instead of collapsing to NULL."""
    # Three co-located points: whichever seeds are chosen, after one
    # update at most one cluster is non-empty, so with k=2 one cluster
    # is empty by construction.
    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    assign, cents = kmeans_quantized(df, "vec_id", "embedding", k=2, iters=2)
    assert len(cents) == 2
    assert all(len(c) == 2 and all(v is not None for v in c) for c in cents)
    # all points in one cluster; both centroids are defined
    assert assign.select("cluster").distinct().count() == 1

    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "embeddings.parquet")
        df.write.parquet(path)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')"
        )
        ctes, final = kmeans_oracle_ctes(k=2, iters=2, dim=2)
        dcent = {
            (c, d): v
            for c, d, v in con.execute(
                f"WITH {ctes} SELECT c, d, v FROM __km_cent2"
            ).fetchall()
        }
        for c in range(2):
            assert [dcent[(c, d + 1)] for d in range(2)] == cents[c]


def test_semdedup_drops_planted_near_dups(spark):
    """On a corpus with planted >=0.99-cosine twins, the greedy rule
    keeps the smallest id of each twin group and drops the rest, and
    unrelated vectors survive."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((int(i), [float(x) for x in v]))
    # ids 100/101/102: near-twins of base[0]; id 200: twin of base[5]
    for j, nid in enumerate((100, 101, 102)):
        rows.append(
            (nid, [float(x + (j + 1) * 1e-3) for x in base[0]])
        )
    rows.append((200, [float(x + 1e-3) for x in base[5]]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    _, cents = kmeans_quantized(df, "vec_id", "embedding", k=2, iters=2)
    dropped = {
        r["vec_id"]
        for r in semdedup_drops(
            df, "vec_id", "embedding", cents, threshold=0.9,
            lsh_bands=8, lsh_rows=10,
        ).collect()
    }
    # chain heads (0 and 5) survive; every planted twin is dropped
    assert dropped == {100, 101, 102, 200}


def test_seed_order_is_md5_rank(spark, sf_small):
    """Seeding must be the md5-rank rule exactly (the oracle's
    ROW_NUMBER mirror depends on it)."""
    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qdf = e.select(
        F.col("vec_id").alias("__id"), quantized_vec("embedding").alias("__q")
    )
    seeds = kmeans_seeds(qdf, "__id", "__q", 4)
    con = _duck(sf_small)
    ids = [
        r[0]
        for r in con.execute(
            "SELECT vec_id FROM embeddings "
            "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4"
        ).fetchall()
    ]
    want = {
        r["__id"]: [int(v) for v in r["__q"]]
        for r in qdf.filter(F.col("__id").isin(ids)).collect()
    }
    assert seeds == [want[i] for i in ids]


def test_kmeans_rejects_empty_and_fewer_than_k_rows(spark):
    """Boundary guards (r6 advisor): empty input and k > n_rows must
    raise a named ValueError instead of TypeError/IndexError
    mid-iteration."""
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="at least k"):
        kmeans_quantized(df, "vec_id", "embedding", k=3, iters=1)
    with pytest.raises(ValueError, match="no rows"):
        kmeans_quantized(
            df.filter("vec_id < 0"), "vec_id", "embedding", k=2, iters=1
        )


def test_kmeans_oracle_dim_mismatch_fails_loudly(spark):
    """A dim parameter disagreeing with the data must ERROR in the
    mirror, not NULL-pad the zipped UNNEST into a plausible-but-wrong
    distance computation (r6 advisor)."""
    import os
    import tempfile

    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "embeddings.parquet")
        df.write.parquet(path)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')"
        )
        ctes, _ = kmeans_oracle_ctes(k=2, iters=1, dim=3)
        with pytest.raises(duckdb.Error, match="dim=3"):
            con.execute(f"WITH {ctes} SELECT * FROM __km_eq").fetchall()
        # the matching dim still runs clean through the same guard
        ctes_ok, _ = kmeans_oracle_ctes(k=2, iters=1, dim=2)
        rows = con.execute(
            f"WITH {ctes_ok} SELECT COUNT(*) FROM __km_eq"
        ).fetchone()
        assert rows[0] == 4
