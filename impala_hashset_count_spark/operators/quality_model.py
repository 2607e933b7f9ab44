"""Model-assisted quality filtering: the classifier stage of a
curation pipeline (the role fasttext-style quality models play in
public LLM-data recipes), Spark-first.

Split the way a 100 TB pipeline must:

- **Training** (``train_quality_model``): pyspark.ml
  LogisticRegression over the cheap per-document features the engine
  already computes JVM-side (``functions.text``) — seeded and
  deterministic. Train on a labeled sample; the corpus-sized pass is
  feature extraction, which is a pure projection.

- **Scoring** (``quality_logit_expr``): the fitted model reduces to a
  coefficient vector, and scoring becomes ONE fixed-association
  multiply-add column expression — whole-stage codegen, no model
  object, no Python, no shuffle. The LOGIT is the score surface on
  purpose: sigmoid needs ``exp`` (not correctly rounded across libms,
  so not engine-bit-stable); the logit is plain +/* and thresholding
  ``logit > 0`` is exactly ``p > 0.5``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Feature extractors (name -> Column builder over a text column).
#: Each is a cheap JVM-side expression from functions.text.


def _feature_cols(text_col: str, toks: Column | None = None) -> dict[str, Column]:
    from ..functions.text import (
        QUALITY_STOPWORDS,
        avg_word_len,
        punct_ratio,
        stopword_ratio,
        token_count,
        tokens,
    )

    if toks is None:
        toks = tokens(text_col)
    return {
        "f_n_tokens": token_count(text_col, toks=toks).cast("double"),
        "f_punct": punct_ratio(text_col),
        "f_stop": stopword_ratio(text_col, QUALITY_STOPWORDS, toks=toks),
        "f_awl": avg_word_len(text_col, toks=toks),
    }


FEATURES = ("f_n_tokens", "f_punct", "f_stop", "f_awl")


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the classifier's feature columns (pure projection)."""
    cols = _feature_cols(text_col)
    out = df
    for name in FEATURES:
        out = out.withColumn(name, F.coalesce(cols[name], F.lit(0.0)))
    return out


def train_quality_model(
    labeled: DataFrame,
    label_col: str,
    text_col: str = "text",
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> dict[str, float]:
    """Fit a logistic-regression quality classifier on a labeled
    sample; returns ``{feature: weight, "__intercept": b}`` — the
    entire deployable artifact. Deterministic: LBFGS on a fixed
    feature order with a fixed reg path has no RNG."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = with_quality_features(labeled, text_col)
    asm = VectorAssembler(inputCols=list(FEATURES), outputCol="__fv")
    lr = LogisticRegression(
        featuresCol="__fv",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=True,
    )
    model = lr.fit(asm.transform(feats))
    weights = {f: float(w) for f, w in zip(FEATURES, model.coefficients)}
    weights["__intercept"] = float(model.intercept)
    return weights


def quality_logit_expr(
    weights: dict[str, float],
    text_col: str = "text",
    toks: Column | None = None,
) -> Column:
    """Score = ``b + sum_i w_i * f_i(text)`` as one codegen'd column
    expression, left-to-right in FEATURES order (fixed association —
    the discipline that keeps emitted floats engine-stable). Positive
    logit == model says keep (p > 0.5). Pass a pre-staged ``toks``
    attribute when scoring alongside other tokenized metrics (the
    same re-tokenization hazard ``functions.text.token_count``
    documents)."""
    cols = _feature_cols(text_col, toks=toks)
    s: Column = F.lit(float(weights["__intercept"]))
    for name in FEATURES:
        s = s + F.lit(float(weights[name])) * F.coalesce(
            cols[name], F.lit(0.0)
        )
    return s


def filter_by_quality_model(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    min_logit: float = 0.0,
) -> DataFrame:
    """Keep rows the classifier scores above ``min_logit`` — a pure
    pushdown-friendly filter over the scan."""
    return df.filter(quality_logit_expr(weights, text_col) > F.lit(min_logit))
