"""Cross-document boilerplate line removal (C4 / RefinedWeb-style).

Web-scraped corpora repeat whole LINES across documents — license
headers, navigation menus, cookie banners. Per-document repetition
signals (``dup_line_ratio``) can't see them: each document contains the
line once. The fix is corpus-level: count how many distinct documents
contain each (trimmed) line, call lines above a document-count threshold
boilerplate, and rewrite every document with those lines removed —
preserving the order and exact bytes of everything kept.

Scale design (the op rewrites the corpus, so one corpus-wide shuffle is
intrinsic — everything else is kept narrow):

- The boilerplate table is built from a per-document DISTINCT line
  explode (narrow) into a partial-aggregated ``groupBy(line)`` — the
  shuffle carries only per-partition distinct repeated-line candidates,
  vocabulary-sized, not corpus-sized.
- Boilerplate is by definition small (lines repeated across >= min_docs
  documents) and is BROADCAST back; the exploded corpus side is never
  shuffled for the membership test (LEFT ANTI broadcast join). A
  deterministic ``max_lines`` cap (top by document count, then line)
  bounds the broadcast under adversarial corpora.
- The single corpus shuffle is the ``groupBy`` that reassembles
  documents; every surviving column rides along in the grouping key so
  no second join against the input is needed.
- ``min_line_chars`` keeps short common lines ("", "-", "```") out of
  the boilerplate table entirely — stripping those would mangle code
  and lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _regex_quote(sep: str) -> str:
    """Quote a literal separator for Java regex by escaping every
    non-alphanumeric character. ``\\Q...\\E`` quoting is NOT safe here:
    a separator containing the literal sequence ``\\E`` would terminate
    the quote early and inject the remainder as live regex, making the
    split and the literal re-join disagree (corrupting kept bytes).
    Per-character escaping has no such escape hatch — Java regex
    permits a backslash before any non-alphanumeric character."""
    if not sep:
        raise ValueError("sep must be non-empty")
    return "".join(ch if ch.isalnum() else "\\" + ch for ch in sep)


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    min_docs: int = 2,
    min_line_chars: int = 4,
    max_lines: int = 100_000,
    sep: str = "\n",
) -> DataFrame:
    """(line, n_docs): trimmed segments of >= ``min_line_chars`` chars
    that appear in >= ``min_docs`` DISTINCT documents, deterministically
    capped at ``max_lines`` by (n_docs desc, line).

    ``sep`` sets the dedup granularity: the default ``"\n"`` is
    line-level (C4-style); ``"\n\n"`` gives paragraph-level dedup for
    corpora with strictly blank-line-separated paragraphs. The
    separator must be a LITERAL (reassembly re-joins with the same
    string — a regex split would lose the original bytes); it is
    regex-quoted internally (per-character escaping, see
    ``_regex_quote``), so metacharacters — including ``\\E`` — are
    safe."""
    per_doc_distinct = df.select(
        F.explode(
            F.array_distinct(
                F.filter(
                    F.transform(
                        F.split(F.col(text_col), F.lit(_regex_quote(sep)), -1),
                        lambda l: F.trim(l),
                    ),
                    lambda l: F.length(l) >= min_line_chars,
                )
            )
        ).alias("line")
    )
    return (
        per_doc_distinct.groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), "line")
        .limit(max_lines)
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    min_line_chars: int = 4,
    max_lines: int = 100_000,
    boilerplate: DataFrame | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Rewrite ``text_col`` with boilerplate lines removed; all other
    columns and the relative order / exact bytes of kept lines are
    preserved. A document whose every line was boilerplate becomes the
    empty string; NULL text stays NULL. Pass ``boilerplate`` to reuse a
    precomputed ``boilerplate_lines`` table (e.g. one built from a
    sample, or shared across ingestion batches).

    Reassembly groups on every non-text column (``id_col`` must be one
    of them — it is what makes groups document-unique). Rows that share
    ALL non-text columns are treated as one document; a corpus with
    duplicate ids is dirty input this op cannot repair (run it before
    dedup, as ``curate_corpus`` does, only when ids are unique)."""
    if id_col not in df.columns:
        raise ValueError(
            f"id_col {id_col!r} not in {df.columns} — reassembly needs a "
            "document-unique key column"
        )
    bp = (
        boilerplate
        if boilerplate is not None
        else boilerplate_lines(
            df, text_col, min_docs, min_line_chars, max_lines, sep
        )
    ).select("line")

    others = [c for c in df.columns if c != text_col]
    exploded = df.select(
        *others,
        F.col(text_col).isNull().alias("__was_null"),
        F.posexplode_outer(
            F.split(F.col(text_col), F.lit(_regex_quote(sep)), -1)
        ).alias(
            "__pos", "__raw"
        ),
    )
    # LEFT join (not anti) + filter INSIDE collect_list: collect_list
    # skips NULL entries, so boilerplate lines drop out while every
    # document keeps its group row — an anti join would delete
    # all-boilerplate documents entirely and force a second corpus
    # shuffle to resurrect them. This way the reassembly groupBy is the
    # ONLY corpus-wide shuffle.
    flagged = exploded.join(
        F.broadcast(bp.withColumn("__bp", F.lit(True))),
        F.trim(F.col("__raw")) == F.col("line"),
        "left",
    )
    rebuilt = flagged.groupBy(*others, "__was_null").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__bp").isNull(),
                            F.struct("__pos", "__raw"),
                        )
                    )
                ),
                lambda s: s["__raw"],
            ),
            sep,
            # posexplode_outer keeps a NULL-text doc as one
            # (NULL, NULL) row whose struct survives into the list;
            # array_join ignores its NULL element, and __was_null
            # restores the NULL below.
        ).alias("__text")
    )
    return rebuilt.select(
        *others,
        F.when(F.col("__was_null"), F.lit(None).cast("string"))
        .otherwise(F.coalesce("__text", F.lit("")))
        .alias(text_col),
    )
