"""Local replica of the driver's correctness gate: run a registered
query on Spark and its oracle SQL on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb

from impala_hashset_count_spark.sources.tables import TABLES, table_path

def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon_cell(v):
    # Floats are compared EXACTLY (via repr) — the external driver gate
    # hashes values with no tolerance, so a tolerant local comparison
    # would mask driver-only failures (it did, in round 2, for
    # corpus_stats_documents). Queries must emit engine-bit-stable
    # floats (exact integer arithmetic, or fixed-point quantization of
    # deterministic per-row expressions — see corpus_stats._qfix).
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon_cell(x) for x in v))
    return (type(v).__name__[:1], str(v))


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def compare_query(spark, sf_dir: str, name: str, fn, oracle: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [c[0].lower() for c in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(cs, cd)):
        assert a == b, f"{name}: first differing canonical row #{i}: spark={a} duckdb={b}"
