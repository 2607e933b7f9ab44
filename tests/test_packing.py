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


def test_property_pack_matches_python_reference(spark):
    """Property test: arbitrary keyed (id, token-count) multisets pack
    identically to a sequential Python reference. Uses an INT group key
    to exercise the derived-from-input output schema (the hardcoded
    string contract broke this)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 50), st.integers(1, 30)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    )

    @given(rows=rows_strategy)
    @settings(
        max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    def check(rows):
        budget = 60
        expect = {}
        for g in {r[0] for r in rows}:
            bin_id, fill = 0, 0
            for _, i, n in sorted(r for r in rows if r[0] == g):
                if bin_id == 0 or fill + n > budget:
                    bin_id, fill = bin_id + 1, n
                else:
                    fill += n
                expect[(g, i)] = bin_id
        df = spark.createDataFrame(rows, "grp int, id long, n int")
        out = pack_sequences_greedy(df, "grp", "id", "n", budget=budget)
        got = {(r.grp, r.id): r.bin_id for r in out.collect()}
        assert got == expect

    check()


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


def test_pack_by_real_bpe_counts(spark, sf_small):
    """Composition glue: chunk -> REAL BPE token count per chunk ->
    greedy pack on that count. The packing operator is count-column
    agnostic; this pins that the real tokenizer plugs in where the
    whitespace estimate did."""
    from pyspark.sql import functions as F

    from impala_hashset_count_spark.functions.bpe import bpe_token_count_expr
    from impala_hashset_count_spark.operators.packing import (
        chunk_documents,
        pack_sequences_greedy,
    )

    d = spark.read.parquet(f"{sf_small}/documents.parquet").limit(40)
    chunks = chunk_documents(d, "doc_id", "text", chunk_tokens=16)
    withbpe = chunks.withColumn("n_bpe", bpe_token_count_expr("chunk_text"))
    budget = 64
    packed = pack_sequences_greedy(
        withbpe, group_col="doc_id", order_col="chunk_id",
        token_col="n_bpe", budget=budget,
    )
    rows = packed.collect()
    assert rows
    # no bin exceeds the budget unless it holds a single oversized row
    bins = {}
    for r in rows:
        bins.setdefault((r.doc_id, r.bin_id), []).append(r.n_bpe)
    for members in bins.values():
        assert sum(members) <= budget or len(members) == 1
    # replicate the greedy scan in pure python per doc
    per_doc = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_id)):
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in per_doc.values():
        cur, bin_id = 0, 1
        for r in doc_rows:
            if cur and cur + r.n_bpe > budget:
                bin_id += 1
                cur = 0
            cur += r.n_bpe
            assert r.bin_id == bin_id, (r.doc_id, r.chunk_id)


def test_chunk_overlap_matches_python_model(spark):
    """Sliding windows (w=10, overlap=3 => stride=7) equal the Python
    stride model: starts at 0,7,14,... while start < max(len-3, 1);
    consecutive chunks share exactly `overlap` tokens except a short
    final; every token is covered."""
    import math

    from impala_hashset_count_spark.operators.packing import chunk_documents

    docs = [
        (1, " ".join(f"t{i}" for i in range(25))),
        (2, " ".join(f"u{i}" for i in range(10))),   # exactly one window
        (3, " ".join(f"v{i}" for i in range(11))),   # 1 extra token -> 2 windows
        (4, "solo"),
        (5, "   "),
        (6, None),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, "doc_id", "text",
                                 chunk_tokens=10, overlap=3).collect()
    }
    expect = {}
    for doc_id, text in docs:
        toks = text.split() if text and text.strip() else []
        if not toks:
            continue
        n_starts = math.ceil(max(len(toks) - 3, 1) / 7)
        for cid in range(n_starts):
            sl = toks[cid * 7 : cid * 7 + 10]
            expect[(doc_id, cid)] = (" ".join(sl), len(sl))
    assert got == expect
    # coverage + overlap invariants on the long doc
    toks = docs[0][1].split()
    spans = [(cid * 7, min(cid * 7 + 10, 25)) for cid in range(4)
             if (1, cid) in got]
    assert spans[0][0] == 0 and max(e for _s, e in spans) == 25
    for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
        assert e1 - s2 == 3  # consecutive windows share exactly `overlap`


def test_chunk_overlap_validation_and_zero_overlap_equivalence(spark):
    import pytest

    from impala_hashset_count_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=-1)
    a = chunk_documents(df, "doc_id", "text", chunk_tokens=2).collect()
    b = chunk_documents(df, "doc_id", "text", chunk_tokens=2, overlap=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_seq_offsets_tile_each_bin_exactly(spark):
    """seq_offset is the trainer-facing span metadata: within every
    (group, bin), documents tile the packed sequence contiguously —
    first offset 0, each next offset = previous offset + previous
    token count, and the bin's fill stays within budget (except the
    documented oversized-single-row bin)."""
    from impala_hashset_count_spark.operators.packing import (
        pack_sequences_greedy,
    )

    rows = [
        ("a", 1, 200), ("a", 2, 200), ("a", 3, 200),   # 512: [1,2] then [3]
        ("a", 4, 900),                                  # oversized alone
        ("b", 1, 512), ("b", 2, 1),
    ]
    df = spark.createDataFrame(rows, "g string, i int, n int")
    out = pack_sequences_greedy(df, "g", "i", "n", budget=512).collect()
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault((r["g"], r["bin_id"]), []).append(r)
    for (_g, _b), grp in by_bin.items():
        grp.sort(key=lambda r: r["i"])
        expect_off = 0
        for r in grp:
            assert r["seq_offset"] == expect_off
            expect_off += r["n"]
        if len(grp) > 1 or grp[0]["n"] <= 512:
            assert expect_off <= 512
    offs = {(r["g"], r["i"]): r["seq_offset"] for r in out}
    assert offs == {
        ("a", 1): 0, ("a", 2): 200, ("a", 3): 0, ("a", 4): 0,
        ("b", 1): 0, ("b", 2): 0,
    }
