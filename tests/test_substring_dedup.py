"""Exact-substring span dedup (the L-gram-cover ExactSubstr
formulation, `operators/substring_dedup.py`)."""

import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.substring_dedup import (
    duplicated_spans,
    strip_duplicated_spans,
)

# a 6-token passage planted in two documents (min_tokens=4 -> covered)
PASSAGE = "the quick brown fox jumps high"


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, f"alpha one two {PASSAGE} tail1 tail2"),
        (2, f"{PASSAGE} beta middle something else entirely"),
        (3, "three common tokens only quick brown fox nothing repeats"),
        (4, "w x y z " + " ".join(f"u{i}" for i in range(8))),
        # within-doc repeat: the same 4-gram twice in ONE document
        (5, "r1 r2 r3 r4 gap1 gap2 r1 r2 r3 r4 done"),
        (6, None),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(df, **kw):
    return {
        (r.doc_id, r.span_start, r.span_tokens, r.n_grams)
        for r in duplicated_spans(df, min_tokens=4, **kw).collect()
    }


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5", None])
def test_planted_spans(planted, hash_fn):
    got = _spans(planted, hash_fn=hash_fn)
    # doc 1: PASSAGE at token positions 4..9 -> gram starts 4,5,6
    #   (3 covered grams, span = 3 + 4 - 1 = 6 tokens)
    # doc 2: PASSAGE at 1..6 -> starts 1,2,3
    # doc 5: "r1 r2 r3 r4" at 1..4 AND 7..10 -> starts 1 and 7,
    #   two separate maximal runs of one gram each (4 tokens)
    # doc 3 shares only a 3-token window with the passage -> below the
    #   4-token threshold, no span
    assert got == {
        (1, 4, 6, 3),
        (2, 1, 6, 3),
        (5, 1, 4, 1),
        (5, 7, 4, 1),
    }


def test_threshold_boundary(spark):
    # exactly min_tokens-1 shared tokens -> NOT a duplicate;
    # exactly min_tokens shared -> one single-gram span
    df3 = spark.createDataFrame(
        [(1, "a b c x1 x2"), (2, "y1 a b c y2")],
        "doc_id bigint, text string",
    )
    assert _spans(df3) == set()
    df4 = spark.createDataFrame(
        [(1, "a b c d x1"), (2, "y1 a b c d")],
        "doc_id bigint, text string",
    )
    assert _spans(df4) == {(1, 1, 4, 1), (2, 2, 4, 1)}


def test_strip_preserves_kept_bytes(planted):
    got = {
        r.doc_id: r.text
        for r in strip_duplicated_spans(planted, min_tokens=4).collect()
    }
    # every token touched by a duplicated 4-gram is removed; kept
    # tokens keep exact bytes and order
    assert got[1] == "alpha one two tail1 tail2"
    assert got[2] == "beta middle something else entirely"
    assert got[3] == "three common tokens only quick brown fox nothing repeats"
    assert got[5] == "gap1 gap2 done"
    assert got[6] is None
    assert got[7] == ""


def test_strip_all_duplicated_becomes_empty(spark):
    df = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r s"), (3, "solo doc here now")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.text
        for r in strip_duplicated_spans(df, min_tokens=4).collect()
    }
    assert got == {1: "", 2: "", 3: "solo doc here now"}


def test_extra_columns_ride_through(spark):
    df = spark.createDataFrame(
        [(1, "en", "c1 c2 c3 c4 u1"), (2, "de", "x c1 c2 c3 c4")],
        "doc_id bigint, lang string, text string",
    )
    got = {
        r.doc_id: (r.lang, r.text)
        for r in strip_duplicated_spans(df, min_tokens=4).collect()
    }
    assert got == {1: ("en", "u1"), 2: ("de", "x")}


def test_recall_model_random(spark):
    """Property vs a direct python model: covered == positions whose
    4-gram occurs twice; spans == maximal covered runs."""
    import random

    rnd = random.Random(31)
    vocab = [f"t{i}" for i in range(30)]
    docs = []
    for did in range(40):
        n = rnd.randint(0, 25)
        docs.append((did, " ".join(rnd.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    L = 4
    from collections import Counter

    grams = Counter()
    per_doc = {}
    for did, text in docs:
        tk = text.split(" ")
        gs = [tuple(tk[i : i + L]) for i in range(max(len(tk) - L + 1, 0))]
        per_doc[did] = gs
        grams.update(gs)
    expect = set()
    for did, gs in per_doc.items():
        covered = [i + 1 for i, g in enumerate(gs) if grams[g] >= 2]
        run = []
        for p in covered:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    expect.add((did, run[0], len(run) + L - 1, len(run)))
                run = [p]
        if run:
            expect.add((did, run[0], len(run) + L - 1, len(run)))
    assert _spans(df) == expect


def test_bad_hash_fn_raises(planted):
    with pytest.raises(ValueError, match="hash_fn"):
        duplicated_spans(planted, hash_fn="sha1")
    with pytest.raises(ValueError, match="document-unique"):
        strip_duplicated_spans(planted.select("text"))


def test_incremental_spans_equal_full_recompute_on_new_batch(spark):
    """The incremental contract: spans found for a new batch against a
    stored gram index == full-corpus duplicated_spans restricted to the
    new batch's ids — across history-only duplication, batch-internal
    duplication, and history+batch cross duplication."""
    from impala_hashset_count_spark.operators.substring_dedup import (
        duplicated_spans,
        duplicated_spans_incremental,
        gram_count_index,
        update_gram_index,
    )

    passage = "the quick brown fox jumps over the lazy dog today"
    hist = spark.createDataFrame(
        [
            (1, f"alpha {passage} beta gamma delta"),
            (2, "unique history text with nothing repeated at all here ok"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            # cross: repeats the history passage
            (10, f"intro words {passage} outro words"),
            # batch-internal pair
            (11, "zz shared batch run one two three four five six end a"),
            (12, "qq shared batch run one two three four five six end b"),
            # nothing duplicated
            (13, "totally fresh material never seen anywhere else at all"),
        ],
        ["doc_id", "text"],
    )
    idx = gram_count_index(hist, min_tokens=8, hash_fn="md5")
    spans, batch_counts = duplicated_spans_incremental(
        batch, idx, min_tokens=8, hash_fn="md5"
    )
    got = sorted(map(tuple, spans.collect()))

    full = duplicated_spans(
        hist.unionByName(batch), min_tokens=8, hash_fn="md5"
    ).filter("doc_id >= 10")
    want = sorted(map(tuple, full.collect()))
    assert got == want
    assert any(d == 10 for d, *_ in got)  # cross-duplication fired
    assert any(d == 11 for d, *_ in got)  # batch-internal fired
    assert not any(d == 13 for d, *_ in got)

    # folding the batch into the index makes a REPLAY of the same batch
    # see its own grams as history (counts additive)
    idx2 = update_gram_index(idx, batch_counts)
    n_total = idx2.agg(F.sum("__n")).first()[0]
    n_direct = gram_count_index(
        hist.unionByName(batch), min_tokens=8, hash_fn="md5"
    ).agg(F.sum("__n")).first()[0]
    assert n_total == n_direct


def test_incremental_empty_history_equals_batch_only(spark):
    from impala_hashset_count_spark.operators.substring_dedup import (
        duplicated_spans,
        duplicated_spans_incremental,
        gram_count_index,
    )

    batch = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff gg hh ii jj"),
            (2, "xx aa bb cc dd ee ff gg hh ii jj yy"),
        ],
        ["doc_id", "text"],
    )
    empty_idx = gram_count_index(batch.limit(0), min_tokens=8, hash_fn="md5")
    spans, _ = duplicated_spans_incremental(
        batch, empty_idx, min_tokens=8, hash_fn="md5"
    )
    got = sorted(map(tuple, spans.collect()))
    want = sorted(
        map(tuple, duplicated_spans(batch, min_tokens=8, hash_fn="md5").collect())
    )
    assert got == want


def test_stream_span_dedup_equals_batch_recompute(spark, tmp_path):
    """LIVE streaming span dedup: two micro-batches of documents; the
    union of per-batch spans equals what each batch's full-corpus
    recompute (history-so-far + batch) assigns to that batch's docs,
    and a fresh-checkpoint replay rewrites identical spans with the
    index not double-counted."""
    import glob
    import os

    from impala_hashset_count_spark.operators.substring_dedup import (
        duplicated_spans,
        gram_count_index,
    )
    from impala_hashset_count_spark.streaming.windows import stream_span_dedup

    passage = "the quick brown fox jumps over the lazy dog now"
    b1 = [(1, f"alpha {passage} one"), (2, "nothing shared here at all in this document")]
    b2 = [(10, f"beta {passage} two"), (11, "fresh unique content again nothing repeated")]
    src = str(tmp_path / "sp_src")
    for batch in (b1, b2):
        spark.createDataFrame(batch, "doc_id bigint, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    spans_path = str(tmp_path / "sp_spans")
    index_path = str(tmp_path / "sp_idx")

    def drain(ck):
        stream = spark.readStream.schema("doc_id bigint, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = stream_span_dedup(
            stream, spans_path, index_path, ck, min_tokens=8
        )
        q.processAllAvailable()
        q.stop()

    drain(str(tmp_path / "sp_ck1"))
    got = sorted(
        map(tuple, spark.read.parquet(spans_path + "/batch=*").collect())
    )

    # ground truth: full recompute over everything; every span lands in
    # whichever batch saw its gram count reach 2 — with one passage
    # repeated across batches, the SECOND occurrence is spanned (the
    # first batch saw count 1). doc 10 carries the span; doc 1 did not
    # at its batch time.
    all_docs = spark.createDataFrame(
        b1 + b2, "doc_id bigint, text string"
    )
    full = {r.doc_id for r in duplicated_spans(all_docs, min_tokens=8).collect()}
    got_docs = {d for d, *_ in got}
    assert got_docs == {10}
    assert full == {1, 10}  # retro-coverage of doc 1 is the batch-mode view

    # the maintained index equals the direct gram count over everything
    vs = sorted(
        int(d.split("=")[1]) for d in os.listdir(index_path) if d.startswith("v=")
    )
    idx = spark.read.parquet(os.path.join(index_path, f"v={vs[-1]}"))
    n_live = idx.agg(F.sum("__n")).first()[0]
    n_direct = gram_count_index(all_docs, min_tokens=8).agg(F.sum("__n")).first()[0]
    assert n_live == n_direct

    # fresh-checkpoint replay: identical spans, index not double-counted
    drain(str(tmp_path / "sp_ck2"))
    replay = sorted(
        map(tuple, spark.read.parquet(spans_path + "/batch=*").collect())
    )
    assert replay == got
    vs2 = sorted(
        int(d.split("=")[1]) for d in os.listdir(index_path) if d.startswith("v=")
    )
    idx2 = spark.read.parquet(os.path.join(index_path, f"v={vs2[-1]}"))
    assert idx2.agg(F.sum("__n")).first()[0] == n_direct
