"""Python UDTFs (user-defined TABLE functions) — the third leg of the
UDF/UDAF/UDTF surface (SURVEY.md §2.11).

The reference defines only a UDA; its host (Impala) offered no UDTF
surface at all. Spark 4 has native Python UDTFs: a class with ``eval``
yielding rows, registrable for SQL ``LATERAL`` use. They run
row-at-a-time in a Python worker, so the engine's hot paths use the
codegen'd equivalents instead (``chunk_documents``'s explode, the array
HOFs); the UDTF exists as the API-surface demonstration and for logic
that genuinely cannot be expressed as column ops.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sent_id int, sentence string, n_sent_tokens int")
class SplitSentences:
    """Explode a document into sentences with per-sentence token counts.

    SQL: ``SELECT d.doc_id, s.* FROM documents d,
    LATERAL split_sentences(d.text) s`` after
    ``register_udtfs(spark)``. The codegen'd equivalent (used by tests
    as the oracle) is ``explode(split(text, sentence_regex))``.
    """

    def eval(self, text: str):  # noqa: D102 - contract documented above
        if not text:
            return
        for i, s in enumerate(_SENTENCE_SPLIT.split(text)):
            s = s.strip()
            if s:
                yield i, s, len(s.split())


def register_udtfs(spark) -> None:
    """Register every UDTF on the SQL surface (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
