"""Eval-set decontamination: known answers, normalization robustness,
a Python-reference property check, and the broadcast plan contract."""

import re

from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.decontaminate import (
    contamination_stats,
    decontaminate,
    eval_shingle_index,
)

EVAL_ROWS = [
    (100, "What is the capital of France? Paris is the capital of France."),
    (101, "Compute the derivative of x squared with respect to x."),
]


def _norm_py(s):
    s = re.sub(r"[^a-z0-9 ]", " ", s.lower())
    return re.sub(r"\s+", " ", s).strip()


def _shingles_py(s, n):
    toks = _norm_py(s).split(" ") if _norm_py(s) else []
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_known_answers(spark):
    docs = [
        # verbatim benchmark copy, different case + punctuation
        (1, "WHAT IS THE CAPITAL OF FRANCE?! Paris is the capital, of France!!"),
        # clean document
        (2, "The weather in the mountains stayed calm for nine straight days overall."),
        # partial overlap: contains one eval 8-gram inside other prose
        (3, "students must compute the derivative of x squared with respect to x today"),
        # too short to form an 8-gram
        (4, "tiny doc"),
    ]
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    e = spark.createDataFrame(EVAL_ROWS, "eval_id bigint, text string")

    stats = {
        r["doc_id"]: r.asDict()
        for r in contamination_stats(d, e, n=8).collect()
    }
    assert stats[1]["contaminated"] and stats[1]["n_hits"] > 0
    assert not stats[2]["contaminated"] and stats[2]["n_hits"] == 0
    assert stats[3]["contaminated"]
    assert stats[4]["n_shingles"] == 0 and stats[4]["contamination_ratio"] == 0.0
    # doc 1 is a normalized near-verbatim copy: every one of its
    # shingles comes from the eval text -> ratio 1.0
    assert stats[1]["contamination_ratio"] == 1.0

    kept = sorted(r["doc_id"] for r in decontaminate(d, e, n=8).collect())
    assert kept == [2, 4]


def test_contamination_matches_python_reference(spark):
    """Deterministic pseudo-random corpus vs an exact Python
    computation of hits against the eval index."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    eval_texts = [" ".join(rng.choice(vocab) for _ in range(40)) for _ in range(3)]
    corpus = []
    for i in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(3, 50))]
        if i % 7 == 0:  # plant an eval span
            src = rng.choice(eval_texts).split()
            k = rng.randrange(len(src) - 8)
            words[1:1] = src[k : k + 8]
        corpus.append((i, " ".join(words)))

    n = 8
    eval_idx = set()
    for t in eval_texts:
        eval_idx |= _shingles_py(t, n)
    expect = {}
    for i, t in corpus:
        shs = _shingles_py(t, n)
        expect[i] = (len(shs), len(shs & eval_idx))

    d = spark.createDataFrame(corpus, "doc_id bigint, text string")
    e = spark.createDataFrame(
        [(j, t) for j, t in enumerate(eval_texts)], "eval_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"])
        for r in contamination_stats(d, e, n=n).collect()
    }
    assert got == expect
    kept = {r["doc_id"] for r in decontaminate(d, e, n=n).collect()}
    assert kept == {i for i, (_, h) in expect.items() if h == 0}


def test_decontaminate_plan_broadcasts_eval_index(spark, sf_small):
    """The corpus-vs-index join must be a BroadcastHashJoin (the corpus
    side never shuffles to meet the eval set)."""
    from impala_hashset_count_spark.sources.tables import load_table

    d = load_table(spark, sf_small, "documents")
    e = d.limit(5).select("doc_id", "text")
    plan = decontaminate(d, e, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_null_text_rows_are_harmless(spark):
    """A NULL text yields zero shingles (never a crash or a spurious
    hit) and survives decontamination untouched."""
    d = spark.createDataFrame(
        [(1, None), (2, "What is the capital of France? Paris is the capital of France.")],
        "doc_id bigint, text string",
    )
    e = spark.createDataFrame(EVAL_ROWS, "eval_id bigint, text string")
    stats = {r["doc_id"]: r.asDict() for r in contamination_stats(d, e, n=8).collect()}
    assert stats[1]["n_shingles"] == 0 and not stats[1]["contaminated"]
    assert stats[2]["contaminated"]
    kept = [r["doc_id"] for r in decontaminate(d, e, n=8).collect()]
    assert kept == [1]


def test_eval_index_is_distinct_and_normalized(spark):
    e = spark.createDataFrame(
        [(1, "Alpha Beta GAMMA delta epsilon zeta eta theta!"),
         (2, "alpha beta gamma delta epsilon zeta eta theta")],
        "eval_id bigint, text string",
    )
    idx = eval_shingle_index(e, n=8).collect()
    assert len(idx) == 1  # identical after normalization
    assert idx[0]["sh"] == "alpha beta gamma delta epsilon zeta eta theta"


def test_curate_corpus_decontaminates(spark, tmp_path):
    from impala_hashset_count_spark.pipelines import curate_corpus

    filler = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, "en", "What is the capital of France? Paris is the capital of France."),
        (2, "en", filler),
        (3, "en", filler + " extra trailing words here"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id bigint, lang string, text string").write.parquet(
        src + "/documents.parquet"
    )
    e = spark.createDataFrame(EVAL_ROWS, "eval_id bigint, text string")
    stats = curate_corpus(
        spark, src, str(tmp_path / "out"), min_quality=0.0, eval_df=e
    )
    assert stats["n_after_decontaminate"] == 2
    assert stats["n_after_quality"] == 2


def test_semantic_decontaminate_drops_paraphrase_neighbors(spark, sf_small):
    """Planted: corpus vectors that are tiny perturbations of eval
    vectors are dropped; orthogonal-ish vectors survive; the corpus is
    never shuffled (broadcast-only plan)."""
    import math

    from impala_hashset_count_spark.operators.decontaminate import (
        semantic_decontaminate,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 31 + i * 7) for i in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    ev_vec = unit(1)
    near = [x + (0.001 if i == 0 else 0.0) for i, x in enumerate(ev_vec)]
    far = unit(99)
    corpus = spark.createDataFrame(
        [(10, ev_vec), (11, near), (12, far)],
        "vec_id bigint, embedding array<double>",
    )
    eval_df = spark.createDataFrame(
        [(1, ev_vec)], "vec_id bigint, embedding array<double>"
    )
    kept = semantic_decontaminate(corpus, eval_df, threshold=0.99)
    assert sorted(r.vec_id for r in kept.collect()) == [12]
    plan = kept._sc is not None and kept._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # empty eval set: corpus passes through untouched
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert semantic_decontaminate(corpus, empty).count() == 3
