"""PII scrub + repetition quality signals: known-answer tests and a
DuckDB cross-engine check for the regex surface (the patterns must
behave identically under Java regex and RE2, or the curation pipeline
and its oracle diverge)."""

import duckdb
from pyspark.sql import functions as F

from impala_hashset_count_spark.functions.text import (
    PII_PATTERNS,
    dup_line_ratio,
    dup_ngram_ratio,
    pii_counts,
    redact_pii,
    top_token_ratio,
)

PII_ROWS = [
    (1, "contact me at alice.smith+work@example.co.uk or bob@test.io"),
    (2, "ssn 123-45-6789 leaked alongside ip 192.168.0.1"),
    (3, "call +1 (555) 123-4567 office: (555)765-4321"),
    (4, "nothing sensitive here, just 12 plain numbers 34"),
]


def test_redact_pii_known_answers(spark):
    df = spark.createDataFrame(PII_ROWS, "id int, text string")
    out = {r["id"]: r["red"] for r in df.select("id", redact_pii("text").alias("red")).collect()}
    assert out[1] == "contact me at [PII] or [PII]"
    assert "123-45-6789" not in out[2] and "192.168.0.1" not in out[2]
    assert "[PII]" in out[2]
    # phone digits gone (the +1-prefixed run and the parenthesized one)
    assert "4567" not in out[3] and "4321" not in out[3]
    assert out[4] == PII_ROWS[3][1]  # untouched


def test_pii_counts_per_kind(spark):
    df = spark.createDataFrame(PII_ROWS, "id int, text string")
    cnts = pii_counts("text")
    got = {
        r["id"]: (r["email"], r["ssn"], r["ipv4"])
        for r in df.select("id", *(c.alias(k) for k, c in cnts.items())).collect()
    }
    assert got[1] == (2, 0, 0)
    assert got[2] == (0, 1, 1)
    assert got[4] == (0, 0, 0)


def test_pii_regexes_agree_with_duckdb(spark):
    """Same patterns, Java regex vs RE2: redacted text must be
    identical — this is what makes the scrub oracle-able."""
    df = spark.createDataFrame(PII_ROWS, "id int, text string")
    got = {
        r["id"]: r["red"]
        for r in df.select("id", redact_pii("text").alias("red")).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    expr = "text"
    for _, pat in PII_PATTERNS:
        expr = f"REGEXP_REPLACE({expr}, '{pat}', '[PII]', 'g')"
    expect = dict(con.execute(f"SELECT id, {expr} FROM t").fetchall())
    assert got == expect


def test_curate_corpus_scrub_pii_end_to_end(spark, tmp_path):
    """Planted PII must not survive into the written training
    sequences when scrub_pii=True (and must survive when False)."""
    from impala_hashset_count_spark.pipelines import curate_corpus

    rows = [
        (i, "en", f"doc {i} reach me at user{i}@example.com " + "filler words " * 20)
        for i in range(8)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id bigint, lang string, text string").write.parquet(
        src + "/documents.parquet"
    )

    out = str(tmp_path / "scrubbed")
    curate_corpus(spark, src, out, min_quality=0.0, chunk_tokens=64, scrub_pii=True)
    written = spark.read.parquet(out)
    assert written.filter(F.col("chunk_text").contains("@example.com")).count() == 0
    assert written.filter(F.col("chunk_text").contains("[PII]")).count() > 0

    out_raw = str(tmp_path / "raw")
    curate_corpus(spark, src, out_raw, min_quality=0.0, chunk_tokens=64)
    raw = spark.read.parquet(out_raw)
    assert raw.filter(F.col("chunk_text").contains("@example.com")).count() > 0


def test_dup_line_ratio(spark):
    rows = [
        (1, "nav\nbody text\nnav\nfooter"),        # 4 lines, 3 distinct
        (2, "one line only"),
        (3, "a\na\na\na"),                          # fully repeated
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: round(r["r"], 4)
        for r in df.select("id", dup_line_ratio("text").alias("r")).collect()
    }
    assert got[1] == 0.25
    assert got[2] == 0.0
    assert got[3] == 0.75


def test_dup_ngram_ratio(spark):
    rows = [
        (1, "the cat sat the cat sat the cat sat"),  # 7 trigrams, 3 distinct
        (2, "every word here appears exactly once total"),
        (3, "too short"),                             # < n tokens -> 0.0
        (4, "a b c"),                                 # exactly one trigram -> 0.0
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: round(r["r"], 4)
        for r in df.select("id", dup_ngram_ratio("text", 3).alias("r")).collect()
    }
    assert got[1] == round(1 - 3 / 7, 4)
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_redact_pii_idempotent_and_ratios_bounded(spark, sf_small):
    """redact(redact(x)) == redact(x) (the token contains nothing any
    pattern can match), and every repetition ratio lands in [0, 1] —
    checked over the whole real documents table."""
    from impala_hashset_count_spark.sources.tables import load_table

    d = load_table(spark, sf_small, "documents")
    twice_differs = d.select(
        redact_pii("text").alias("once"),
        redact_pii(redact_pii("text")).alias("twice"),
    ).filter(F.col("once") != F.col("twice"))
    assert twice_differs.count() == 0

    bad = d.select(
        dup_line_ratio("text").alias("a"),
        dup_ngram_ratio("text", 3).alias("b"),
        top_token_ratio("text").alias("c"),
    ).filter(
        ~F.col("a").between(0.0, 1.0)
        | ~F.col("b").between(0.0, 1.0)
        | ~F.col("c").between(0.0, 1.0)
    )
    assert bad.count() == 0


def test_curate_corpus_repetition_gates(spark, tmp_path):
    """Planted repetitive docs are dropped by the Gopher-style gates
    while normal prose survives."""
    from impala_hashset_count_spark.pipelines import curate_corpus

    prose = " ".join(f"word{i}" for i in range(40))
    rows = [
        (1, "en", prose),
        (2, "en", "nav bar\n" * 20 + prose),            # dup lines
        (3, "en", "the cat sat " * 20),                  # dup trigrams
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id bigint, lang string, text string").write.parquet(
        src + "/documents.parquet"
    )
    stats = curate_corpus(
        spark,
        src,
        str(tmp_path / "out"),
        min_quality=0.0,
        max_dup_line_ratio=0.3,
        max_dup_ngram_ratio=0.3,
    )
    assert stats["n_after_quality"] == 1


def test_top_token_ratio(spark):
    rows = [
        (1, "buy buy buy now buy"),     # 4/5 'buy'
        (2, "all tokens are distinct"),
        (3, "x"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: round(r["r"], 4)
        for r in df.select("id", top_token_ratio("text").alias("r")).collect()
    }
    assert got[1] == 0.8
    assert got[2] == 0.25
    assert got[3] == 1.0
