"""Sequence chunking and packing — the operators that turn a cleaned
document corpus into fixed-budget training sequences.

The reference has no such surface (it is one aggregate,
`/root/reference/hashset-count.cc:82-524`); these extend the engine for
the LLM-data-pipeline north star alongside dedup/similarity/text.

Two operators:

- ``chunk_documents`` — split each document's token stream into
  fixed-size windows (the "context length" chunker). Pure per-row
  array expressions (split -> transform over window starts -> slice),
  JVM-side, zero shuffle: embarrassingly parallel at 100 TB.
- ``pack_sequences_greedy`` — greedily pack whole documents into bins
  of a token budget (sequence packing for training efficiency).
  Packing is inherently a sequential scan over an ordered group, so it
  runs as ``applyInPandas`` per group: one shuffle on the group key,
  then a linear pass per group in Arrow batches. Group granularity is
  the scale knob — pack within (lang, shard) rather than globally; a
  global pack of 100 TB would serialize on one worker and is exactly
  what this API shape refuses to express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 0,
) -> DataFrame:
    """Explode each document into fixed-size token windows.

    Returns (id, chunk_id, chunk_text, n_chunk_tokens); blank documents
    yield zero chunks; the final chunk may be short (no padding — that
    is the collator's job, not the engine's). chunk_id is 0-based.

    ``overlap`` > 0 gives SLIDING windows at stride
    ``chunk_tokens - overlap`` (the RAG / long-context "stride"
    convention: consecutive chunks share ``overlap`` tokens so no
    span longer than the overlap is ever split across a boundary).
    Window starts run while ``start < max(size - overlap, 1)``, so the
    final window always contributes at least one new token — no window
    is fully contained in its predecessor. Still a pure per-row array
    expression: zero shuffle at any overlap.

    Oracle mirror (DuckDB): GENERATE_SERIES over
    ceil(max(len - overlap, 1)/stride), then LIST_SLICE +
    ARRAY_TO_STRING on the same whitespace tokens.
    """
    w = int(chunk_tokens)
    ov = int(overlap)
    if not 0 <= ov < w:
        raise ValueError(f"overlap must satisfy 0 <= overlap < chunk_tokens, got {ov}")
    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    based = df.select(F.col(id_col), toks.alias("__toks"))
    # Guard n=0: sequence(0, -1) is DESCENDING in Spark ([0, -1]), so an
    # empty doc must short-circuit to an empty chunk array, mirroring
    # the short-doc guard in dedup._shingle_expr.
    stride = w - ov
    chunks = F.expr(
        f"""
        CASE WHEN __toks IS NULL OR size(__toks) = 0 THEN
            CAST(array() AS array<struct<chunk_id:int,chunk_text:string,n_chunk_tokens:int>>)
        ELSE
            transform(
                sequence(0, CAST(ceil(greatest(size(__toks) - {ov}, 1) / {stride}.0) AS INT) - 1),
                i -> struct(
                    CAST(i AS INT) AS chunk_id,
                    array_join(slice(__toks, i * {stride} + 1, {w}), ' ') AS chunk_text,
                    size(slice(__toks, i * {stride} + 1, {w})) AS n_chunk_tokens
                )
            )
        END
        """
    )
    return based.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(id_col, "__c.chunk_id", "__c.chunk_text", "__c.n_chunk_tokens")


def pack_sequences_greedy(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Greedy first-fit packing of whole rows into token-budget bins,
    independently per ``group_col``, scanning in ``order_col`` order.

    A row starts a new bin when adding it would exceed ``budget`` (a
    single row larger than the budget gets a bin of its own). bin_id is
    1-based per group. ``seq_offset`` is the row's starting TOKEN
    OFFSET inside its bin — the span metadata a trainer needs to build
    per-document attention/loss masks over the packed sequence (doc i
    occupies [seq_offset, seq_offset + n_tokens) of bin bin_id).
    Deterministic given the ordering, hence fully oracle-checkable
    (DuckDB mirror: a linear recursive CTE advancing one row at a time
    per group).

    Scale shape: one shuffle on the group key; state per group is two
    scalars (current bin, current fill) — the same running-state
    discipline as the reference aggregate's update loop
    (`/root/reference/hashset-count.cc:105-192`), expressed over an
    ordered Arrow batch instead of a hash set.
    """
    budget = int(budget)
    # Output types are DERIVED from the input schema (a hardcoded
    # string/bigint/int contract broke callers with e.g. int group keys
    # at runtime despite the generic-looking API).
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (
        f"{group_col} {in_types[group_col]}, {order_col} {in_types[order_col]}, "
        f"{token_col} {in_types[token_col]}, bin_id bigint, seq_offset bigint"
    )

    def pack(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bins, offsets = [], []
        bin_id, fill = 0, 0
        for n in pdf[token_col]:
            n = int(n)
            if bin_id == 0 or fill + n > budget:
                bin_id += 1
                offsets.append(0)
                fill = n
            else:
                offsets.append(fill)
                fill += n
            bins.append(bin_id)
        pdf = pdf[[group_col, order_col, token_col]].copy()
        pdf["bin_id"] = bins
        pdf["seq_offset"] = offsets
        return pdf

    return (
        df.select(group_col, order_col, token_col)
        .groupBy(group_col)
        .applyInPandas(pack, schema=out_schema)
    )
