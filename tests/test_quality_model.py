"""Model-assisted quality filtering: distributed LR training reduced
to a coefficient dict, scored as one JVM column expression."""

import math

from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.quality_model import (
    FEATURES,
    filter_by_quality_model,
    quality_logit_expr,
    train_quality_model,
    with_quality_features,
)


def _planted(spark):
    # separable fixture: 'good' docs are long clean prose, 'bad' docs
    # are short punctuation soup
    good = [(i, "the quick brown fox jumps over the lazy dog and runs on", 1.0)
            for i in range(60)]
    bad = [(100 + i, "!!! ??? ,,, ;;; ...", 0.0) for i in range(60)]
    return spark.createDataFrame(good + bad, "doc_id long, text string, label double")


def test_train_separates_planted_labels(spark):
    d = _planted(spark)
    w = train_quality_model(d, "label")
    assert set(w) == set(FEATURES) | {"__intercept"}
    scored = d.select("label", quality_logit_expr(w).alias("logit")).collect()
    assert all((r.logit > 0) == (r.label == 1.0) for r in scored)
    kept = filter_by_quality_model(d, w)
    assert kept.count() == 60
    assert kept.filter("label = 0.0").count() == 0


def test_training_is_deterministic(spark):
    d = _planted(spark)
    assert train_quality_model(d, "label") == train_quality_model(d, "label")


def test_logit_matches_pure_python(spark, sf_small):
    d = spark.read.parquet(f"{sf_small}/documents.parquet").limit(30)
    lab = d.withColumn("label", (F.length("text") > 100).cast("double"))
    w = train_quality_model(lab, "label")
    feats = with_quality_features(d).select("doc_id", *FEATURES).collect()
    got = {
        r.doc_id: r.logit
        for r in d.select("doc_id", quality_logit_expr(w).alias("logit")).collect()
    }
    for r in feats:
        expect = w["__intercept"]
        for f in FEATURES:
            expect = expect + w[f] * getattr(r, f)
        assert got[r.doc_id] == expect or (
            math.isnan(expect) and math.isnan(got[r.doc_id])
        ), r.doc_id


def test_null_text_scores_finite(spark):
    d = spark.createDataFrame(
        [(0, None, 0.0), (1, "some ordinary text here", 1.0)] * 20,
        "doc_id long, text string, label double",
    )
    w = train_quality_model(d, "label")
    rows = d.select(quality_logit_expr(w).alias("l")).collect()
    assert all(r.l is not None and not math.isnan(r.l) for r in rows)
