"""Adversarial string content through the text/dedup operators: embedded
NUL bytes, non-ASCII UTF-8 (multi-byte, non-BMP emoji), and mixed
whitespace. These are exactly the payloads 100 TB of scraped web text
contains, and the classic silent-corruption vectors:

- C-string-based hashing truncates at the first ``\\0`` (e.g. pandas'
  klib-backed ``Series.nunique``), conflating distinct documents;
- byte-length vs char-length confusion miscounts multi-byte text;
- ASCII-only whitespace classes split differently from Unicode-aware
  ones.

The engine must treat strings as opaque char sequences: distinct counts
exact, fingerprints collision-free across NUL-truncation twins, dedup
keeping NUL-distinct docs apart.
"""

from pyspark.sql import functions as F

from impala_hashset_count_spark.functions.text import (
    fingerprint_md5,
    token_count,
)
from impala_hashset_count_spark.operators.dedup import exact_dedup
from impala_hashset_count_spark.operators.hashset_count import hashset_count_df

# Pairs that collide under first-NUL truncation, plus multi-byte text.
ADVERSARIAL_DOCS = [
    (1, "prefix\x00suffix-A"),
    (2, "prefix\x00suffix-B"),
    (3, "prefix"),            # equals the NUL-truncated prefix of 1 and 2
    (4, "prefix\x00suffix-A"),  # true duplicate of 1
    (5, "café résumé"),          # 2-byte UTF-8
    (6, "cafe resume"),                          # ASCII lookalike
    (7, "你好世界"),             # CJK, no spaces
    (8, "emoji \U0001f600\U0001f680 tail"),      # non-BMP surrogate pairs
    (9, "tab\tand\nnewline  spaces"),
]


def _docs(spark):
    return spark.createDataFrame(ADVERSARIAL_DOCS, "doc_id int, text string")


def test_distinct_counts_see_past_nul_bytes(spark):
    d = _docs(spark)
    # 9 rows, 8 distinct texts (1 == 4); NUL-truncation would conflate
    # {1, 2, 3, 4} into one value and report 5.
    got = d.agg(F.count_distinct("text").alias("n")).first()["n"]
    assert got == 8


def test_hashset_count_tiers_on_nul_values(spark):
    d = _docs(spark).select(F.lit("g").alias("grp"), F.col("text").alias("v"))
    # idiomatic tier (BIGINT) and faithful tier (STRING result)
    out = hashset_count_df(d, ["grp"], ["v"], faithful=False).first()
    assert out["hashset_count_v"] == 8
    out_f = hashset_count_df(d, ["grp"], ["v"], faithful=True).first()
    assert out_f["hashset_count_v"] == "8"


def test_exact_dedup_keeps_nul_distinct_docs(spark):
    d = _docs(spark)
    kept = exact_dedup(d, ["text"], "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # doc 4 (duplicate of 1) dropped; NUL-suffix variants all kept
    assert ids == [1, 2, 3, 5, 6, 7, 8, 9]


def test_fingerprint_distinguishes_nul_truncation_twins(spark):
    d = _docs(spark).filter(F.col("doc_id").isin(1, 2, 3))
    fps = [r[0] for r in d.select(fingerprint_md5("text")).collect()]
    # normalize_text maps NUL (and every non-alnum) to space, so doc 1
    # and 2 differ in their suffix and doc 3 in length — 3 distinct fps
    assert len(set(fps)) == 3


def test_char_semantics_for_multibyte_text(spark):
    d = _docs(spark)
    rows = {
        r["doc_id"]: (r["n_chars"], r["n_toks"])
        for r in d.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            token_count("text").alias("n_toks"),
        ).collect()
    }
    assert rows[5] == (11, 2)   # chars not bytes (13 bytes in UTF-8)
    assert rows[7] == (4, 1)    # 4 CJK chars, one whitespace token
    # 13 codepoints: each emoji counts ONE (UTF-16-unit counting — the
    # JVM String.length trap — would report 15)
    assert rows[8] == (13, 3)
    assert rows[9] == (23, 4)   # tab/newline are token separators


def test_spark_and_duckdb_agree_on_adversarial_distincts(spark):
    """The oracle engine must see the same distinct structure — guards
    against either engine's hashing truncating at NUL."""
    import duckdb

    d = _docs(spark)
    spark_n = d.agg(F.count_distinct("text")).first()[0]
    con = duckdb.connect()
    con.register("docs", d.toPandas())
    duck_n = con.execute("SELECT COUNT(DISTINCT text) FROM docs").fetchone()[0]
    assert spark_n == duck_n == 8


def test_new_ops_survive_nul_and_unicode(spark):
    """Embedded NULs and multi-byte text through the sixth-session
    operators: distinct identities stay distinct, nothing truncates at
    the NUL (the pandas-klib trap), unicode never crashes the
    production tiers."""
    from impala_hashset_count_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )
    from impala_hashset_count_spark.operators.dedup import edit_distance_pairs
    from impala_hashset_count_spark.operators.drift import distribution_drift
    from impala_hashset_count_spark.operators.sampling import priority_sample

    nul_a, nul_b = "ab\x00cd", "ab\x00ce"
    uni = "café 日本語 emoji🙂 mix"

    # bloom: NUL-distinct keys get distinct verdicts (a\0b != a\0c)
    hist = spark.createDataFrame([(nul_a,), (uni,)], "key string")
    bloom = bloom_build(hist, "key", 4096, hash_fn="xxhash64")
    probe = spark.createDataFrame([(nul_a,), (nul_b,), (uni,)], "key string")
    got = {r.key: r.maybe_seen
           for r in bloom_probe(probe, "key", bloom, 4096,
                                hash_fn="xxhash64").collect()}
    assert got[nul_a] is True and got[uni] is True
    assert got[nul_b] is False  # differs only after the NUL

    # priority_sample: NUL-distinct keys rank independently, both kept
    df = spark.createDataFrame(
        [(nul_a, 5), (nul_b, 5), (uni, 5)], "key string, w bigint"
    )
    ranks = {r.key for r in priority_sample(df, "key", "w", k=3).collect()}
    assert ranks == {nul_a, nul_b, uni}

    # edit distance (production tier, no ASCII restriction): unicode
    # codepoint-level distance, NUL counts as a character
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat today ok"),
         (2, "the cat sat on the mat today yo"),
         (3, uni + " the cat sat on the mat today")],
        "doc_id bigint, text string",
    )
    pairs = {(r.id_1, r.id_2): r.edit_sim
             for r in edit_distance_pairs(
                 docs, "doc_id", "text", candidate_threshold=0.2,
                 min_sim=0.0).collect()}
    assert (1, 2) in pairs and 0.9 < pairs[(1, 2)] < 1.0

    # drift: NUL and unicode tokens are ordinary vocabulary entries
    a = spark.createDataFrame([(f"{nul_a} {uni}",)], "text string")
    b = spark.createDataFrame([(f"{nul_b} {uni}",)], "text string")
    row = distribution_drift(a, b).collect()[0]
    # vocabulary: nul_a, nul_b + the four whitespace-split unicode
    # tokens (café / 日本語 / emoji🙂 / mix) shared by both sides
    assert row.v == 6
    assert row.tv_num > 0


def test_substring_spans_and_strip_survive_nul_and_multibyte(spark):
    """Exact-substring span dedup over adversarial tokens: a repeated
    8-token passage whose tokens carry NUL bytes and non-BMP emoji is
    detected in both carriers, and the strip rebuilds surviving bytes
    exactly (no NUL truncation, no mojibake)."""
    from impala_hashset_count_spark.operators.substring_dedup import (
        duplicated_spans,
        strip_duplicated_spans,
    )

    passage = "a\x00x café 你好 \U0001f600 tail\x00y mid fin eight"
    assert len(passage.split(" ")) == 8
    docs = spark.createDataFrame(
        [
            (1, f"head {passage} uniq-one"),
            (2, f"other {passage} uniq-two"),
            (3, "plain unrepeated filler text of enough many words here"),
            (4, None),
        ],
        "doc_id int, text string",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_tokens"])
        for r in duplicated_spans(docs, min_tokens=8, hash_fn="md5").collect()
    }
    # the repeated passage starts at token 2 in both carriers; a
    # NUL-truncating hash would conflate "a\x00x" with a bare "a" gram
    # and (worse) a byte-lossy rebuild would corrupt the kept tokens
    assert spans == {1: (2, 8), 2: (2, 8)}

    stripped = {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_spans(
            docs, min_tokens=8, hash_fn="md5"
        ).collect()
    }
    assert stripped[1] == "head uniq-one"
    assert stripped[2] == "other uniq-two"
    assert stripped[3] == "plain unrepeated filler text of enough many words here"
    assert stripped[4] is None

    # xxhash64 production tier: identical spans on the same payload
    spans_xx = {
        r["doc_id"]: (r["span_start"], r["span_tokens"])
        for r in duplicated_spans(
            docs, min_tokens=8, hash_fn="xxhash64"
        ).collect()
    }
    assert spans_xx == spans
