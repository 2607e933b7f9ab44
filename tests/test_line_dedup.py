"""Cross-document boilerplate line removal (C4/RefinedWeb-style)."""

import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.line_dedup import (
    boilerplate_lines,
    strip_boilerplate_lines,
)

from .test_plans import explain_str

HEADER = "Copyright (c) Example Corp. All rights reserved."
MENU = "Home | About | Contact"


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, f"{HEADER}\nunique alpha text\nmore alpha"),
        (2, f"{HEADER}\n{MENU}\nunique beta text"),
        (3, f"{MENU}\nunique gamma text\n{HEADER}"),
        (4, "an original document\nwith no boilerplate at all"),
        (5, HEADER),          # all-boilerplate -> becomes ""
        (6, None),            # NULL stays NULL
        (7, ""),              # empty stays empty
        (8, f"  {HEADER}  \nindented but same trimmed line"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_boilerplate_table(planted):
    bp = {r.line: r.n_docs for r in boilerplate_lines(planted, min_docs=3).collect()}
    # HEADER appears (trimmed) in docs 1, 2, 3, 5, 8 -> 5; MENU only in
    # 2 and 3 -> below the min_docs=3 bar.
    assert bp == {HEADER: 5}
    bp2 = {r.line: r.n_docs for r in boilerplate_lines(planted, min_docs=2).collect()}
    assert bp2 == {HEADER: 5, MENU: 2}


def test_strip_preserves_content_and_order(planted):
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(planted, min_docs=2).collect()
    }
    assert out[1] == "unique alpha text\nmore alpha"
    assert out[2] == "unique beta text"
    assert out[3] == "unique gamma text"
    assert out[4] == "an original document\nwith no boilerplate at all"
    assert out[5] == ""            # all lines were boilerplate
    assert out[6] is None          # NULL text untouched
    assert out[7] == ""            # empty text untouched
    # kept lines keep their exact bytes (the indented HEADER matched by
    # TRIM is removed; the remaining line is byte-identical)
    assert out[8] == "indented but same trimmed line"
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8}


def test_strip_keeps_other_columns(spark):
    rows = [(1, "en", f"{HEADER}\nkeep me"), (2, "de", f"{HEADER}\nbehalte mich")]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = strip_boilerplate_lines(df, min_docs=2).collect()
    got = {(r.doc_id, r.lang, r.text) for r in out}
    assert got == {(1, "en", "keep me"), (2, "de", "behalte mich")}


def test_short_common_lines_never_stripped(spark):
    # "---" and "" repeat everywhere but are under min_line_chars
    rows = [(i, f"---\n\nreal content {i}") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r.text for r in strip_boilerplate_lines(df, min_docs=2).collect()}
    assert out[1] == "---\n\nreal content 1"


def test_precomputed_table_reuse_and_cap(planted):
    bp = boilerplate_lines(planted, min_docs=2, max_lines=1)
    # deterministic cap: highest n_docs first -> HEADER survives the cap
    assert [r.line for r in bp.collect()] == [HEADER]
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(planted, boilerplate=bp).collect()
    }
    # MENU stayed (capped out of the table)
    assert out[3] == f"{MENU}\nunique gamma text"


def test_matches_duckdb_mirror_on_documents(spark, sf_small):
    """Full engine cross-check on the real documents table: DuckDB
    computes the same strip (trim-matched lines in >= 2 docs, >= 4
    chars) and the rewritten texts must agree doc by doc."""
    import duckdb

    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(
            d.select("doc_id", "text"), min_docs=2
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    rows = con.execute(
        r"""
        WITH lines AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, chr(10))) AS raw,
                   GENERATE_SUBSCRIPTS(STRING_SPLIT(text, chr(10)), 1) AS pos
            FROM documents
        ),
        bp AS (
            SELECT TRIM(raw) AS line
            FROM (SELECT DISTINCT doc_id, TRIM(raw) AS raw FROM lines
                  WHERE LENGTH(TRIM(raw)) >= 4)
            GROUP BY 1 HAVING COUNT(*) >= 2
        ),
        kept AS (
            SELECT l.doc_id, l.pos, l.raw FROM lines l
            LEFT JOIN bp ON TRIM(l.raw) = bp.line
            WHERE bp.line IS NULL
        )
        SELECT d.doc_id,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE COALESCE(
                        (SELECT STRING_AGG(k.raw, chr(10) ORDER BY k.pos)
                         FROM kept k WHERE k.doc_id = d.doc_id), '')
               END AS text
        FROM documents d
        """
    ).fetchall()
    expected = dict(rows)
    assert got == expected


def test_plan_single_corpus_shuffle(spark, sf_small):
    d = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "text")
    plan = explain_str(strip_boilerplate_lines(d, min_docs=2))
    # boilerplate membership test must be broadcast, never a shuffle of
    # the exploded corpus
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_paragraph_granularity(spark):
    """sep='\\n\\n' dedups whole blank-line-separated paragraphs — a
    multi-line repeated paragraph is removed as one unit (line-level
    would only catch its individual lines)."""
    para = "We use cookies on this site.\nSee our policy for details."
    rows = [
        (1, f"{para}\n\nunique one"),
        (2, f"unique two\n\n{para}"),
        (3, f"{para}\n\nunique three\n\nanother para"),
        (4, "no boilerplate here\n\nat all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    bp = [r.line for r in boilerplate_lines(df, min_docs=2, sep="\n\n").collect()]
    assert bp == [para]
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(df, min_docs=2, sep="\n\n").collect()
    }
    assert out == {
        1: "unique one",
        2: "unique two",
        3: "unique three\n\nanother para",
        4: "no boilerplate here\n\nat all",
    }


def test_separator_with_regex_metachars_is_literal(spark):
    rows = [(1, "a|b|KEEP"), (2, "c|b|d"), (3, "b|x")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # '|' as a raw regex would split on EVERY character boundary; the
    # quoted literal must split on the pipe itself. min_line_chars=1 so
    # the shared 'b' segment counts.
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(
            df, min_docs=3, min_line_chars=1, sep="|"
        ).collect()
    }
    assert out == {1: "a|KEEP", 2: "c|d", 3: "x"}


def test_property_strip_matches_python_reference(spark):
    """Random small corpora: strip must equal a direct Python
    computation of the same rule (trimmed segments >= min chars in >=
    min_docs distinct docs removed, kept bytes re-joined)."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    line = st.text(alphabet="abX \n", min_size=0, max_size=10)
    doc = st.lists(line, min_size=0, max_size=5).map(lambda ls: "\n".join(ls))
    corpus = st.lists(doc, min_size=1, max_size=6)

    @settings(
        max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    @given(corpus)
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        seen = Counter()
        for _, t in rows:
            for seg in {
                s.strip() for s in t.split("\n") if len(s.strip()) >= 2
            }:
                seen[seg] += 1
        bp = {seg for seg, n in seen.items() if n >= 2}
        expected = {
            i: "\n".join(s for s in t.split("\n") if s.strip() not in bp)
            for i, t in rows
        }
        got = {
            r.doc_id: r.text
            for r in strip_boilerplate_lines(
                df, min_docs=2, min_line_chars=2
            ).collect()
        }
        assert got == expected

    run()


def test_separator_containing_backslash_E_is_literal(spark):
    r"""A separator containing the literal sequence ``\E`` must not
    terminate the internal regex quoting early (the \Q...\E footgun):
    split and literal re-join must agree byte-for-byte."""
    from impala_hashset_count_spark.operators.line_dedup import (
        boilerplate_lines,
        strip_boilerplate_lines,
    )

    sep = r"\E|"
    rows = [
        (1, rf"BOILER{sep}keep one"),
        (2, rf"BOILER{sep}keep two"),
        (3, rf"BOILER{sep}keep three"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    bp = [
        r.line
        for r in boilerplate_lines(df, min_docs=3, min_line_chars=1, sep=sep).collect()
    ]
    assert bp == ["BOILER"]
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(
            df, min_docs=3, min_line_chars=1, sep=sep
        ).collect()
    }
    assert out == {1: "keep one", 2: "keep two", 3: "keep three"}


def test_empty_separator_rejected():
    import pytest

    from impala_hashset_count_spark.operators.line_dedup import _regex_quote

    with pytest.raises(ValueError):
        _regex_quote("")
