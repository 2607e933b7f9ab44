"""Unit tests for the sequence chunking / packing operators
(operators/packing.py) on hand-built frames covering the edge cases the
sf-data oracle cannot guarantee to hit: blank docs, docs larger than
the budget, exact-budget fits, and per-group independence."""

from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.packing import (
    chunk_documents,
    pack_sequences_greedy,
)


def _toks(n):
    return " ".join(f"t{i}" for i in range(n))


def test_chunk_blank_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b c"), (4, _toks(5))],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, "doc_id", "text", chunk_tokens=4).collect()
    }
    # Blank docs yield zero chunks.
    assert not any(k[0] in (1, 2) for k in rows)
    assert rows[(3, 0)] == ("a b c", 3)
    # 5 tokens at window 4 -> one full chunk + one short chunk.
    assert rows[(4, 0)] == ("t0 t1 t2 t3", 4)
    assert rows[(4, 1)] == ("t4", 1)


def test_chunk_exact_multiple(spark):
    df = spark.createDataFrame([(1, _toks(8))], "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4).collect()
    assert [(r.chunk_id, r.n_chunk_tokens) for r in sorted(out, key=lambda r: r.chunk_id)] == [
        (0, 4),
        (1, 4),
    ]


def test_pack_greedy_semantics(spark):
    # group g: 300 + 200 fit budget 512; +100 would overflow -> bin 2;
    # 600 > budget gets its own bin 3.
    # group h: independent numbering restarts at bin 1.
    df = spark.createDataFrame(
        [
            ("g", 1, 300),
            ("g", 2, 200),
            ("g", 3, 100),
            ("g", 4, 600),
            ("h", 5, 512),
            ("h", 6, 1),
        ],
        "grp string, id long, n int",
    )
    out = pack_sequences_greedy(df, "grp", "id", "n", budget=512)
    got = {(r.grp, r.id): r.bin_id for r in out.collect()}
    assert got == {
        ("g", 1): 1,
        ("g", 2): 1,
        ("g", 3): 2,
        ("g", 4): 3,
        ("h", 5): 1,
        ("h", 6): 2,
    }


def test_pack_is_order_not_arrival_dependent(spark):
    # Same rows in scrambled input order -> identical packing (the
    # operator sorts by order_col inside each group).
    rows = [("g", i, 100) for i in (3, 1, 5, 2, 4)]
    df = spark.createDataFrame(rows, "grp string, id long, n int").repartition(4)
    out = pack_sequences_greedy(df, "grp", "id", "n", budget=250)
    got = {r.id: r.bin_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3}


def test_chunk_concat_roundtrip(spark, sf_small):
    # Re-joining a doc's chunks reproduces its token stream exactly.
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=64)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("re_text")
        )
    )
    orig = docs.select(
        "doc_id",
        F.array_join(F.split(F.trim("text"), r"\s+"), " ").alias("norm_text"),
    ).filter(F.length(F.trim("text")) > 0)
    joined = orig.join(rebuilt, "doc_id")
    assert joined.filter(F.col("norm_text") != F.col("re_text")).count() == 0
    assert joined.count() == orig.count()
