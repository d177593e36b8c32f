"""Trainable document-quality classifier (the fastText-classifier slot).

Real curation stacks pair the heuristic gates (``text.quality_score``,
``text.gopher_keep``) with a TRAINED quality model: a linear classifier
fit on "known good" (wiki/books) vs "known bad" (raw crawl) labels,
whose score then drives ``quantile_filter`` / ``perplexity_bucket``-
style selection. This module provides that slot Spark-first:

- features are the engine's own pure-Column quality signals
  (stopword/alpha ratios, mean token length, log token count) — no
  tokenizer dependency, DuckDB-replayable, computed in codegen;
- training is MLlib ``LogisticRegression`` over those features
  (distributed, one pass pipeline; ``standardization=False`` so the
  learned weights apply DIRECTLY to the raw feature expressions);
- inference is ``score_quality_model`` — a pure sigmoid-of-dot-product
  Column expression with the weights baked as literals, so scoring a
  100 TB corpus is a map-only codegen stage with NO model object,
  MLlib dependency, or Python worker on the hot path.

The train→extract-literals→expression-score loop is the same
bake-values-as-literals pattern the ANN quantizers use (ann.py): heavy
fitting happens once, the recurring path is plain columnar compute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lotus_spark.functions.text import (
    alpha_ratio,
    avg_token_len,
    stopword_ratio,
    token_count,
)

#: feature order baked into trained models; scorers rely on it.
QUALITY_FEATURES = ("stopword_ratio", "alpha_ratio", "avg_token_len",
                    "log_tokens")


def quality_feature_cols(text: Column) -> list[Column]:
    """The model's feature vector as 4 pure Column expressions, in
    :data:`QUALITY_FEATURES` order. ``log_tokens`` is ``ln(1+n)`` so
    document length enters sub-linearly."""
    return [
        stopword_ratio(text),
        alpha_ratio(text),
        avg_token_len(text),
        F.log1p(token_count(text).cast("double")),
    ]


def train_quality_model(
    df: DataFrame,
    text_col: str,
    label_col: str,
    max_iter: int = 100,
    reg_param: float = 0.0,
) -> dict:
    """Fit the logistic quality model on labeled rows (``label_col`` ∈
    {0,1}; 1 = keep-quality). Returns a plain-dict model — ``{"weights":
    [w0..w3], "bias": b, "features": QUALITY_FEATURES}`` — that is
    JSON-serializable and feeds :func:`score_quality_model` as
    literals. Training is MLlib's distributed LBFGS; the returned dict
    is the only artifact the scoring path needs (no MLlib at
    inference)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = quality_feature_cols(F.col(text_col))
    train = df.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(
            F.array(*[f.cast("double") for f in feats])
        ).alias("features"),
    )
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,  # weights must apply to RAW features
        family="binomial",
    )
    m = lr.fit(train)
    return {
        "weights": [float(w) for w in m.coefficients],
        "bias": float(m.intercept),
        "features": list(QUALITY_FEATURES),
    }


def score_quality_model(text: Column, model: dict) -> Column:
    """P(quality) under a trained (or hand-set) model: ``sigmoid(b + w ·
    features(text))`` as one codegen expression — weights enter as
    literals, so Catalyst constant-folds and the scan stays UDF-free."""
    weights = model["weights"]
    feats = quality_feature_cols(text)
    if len(weights) != len(feats):
        raise ValueError(
            f"model has {len(weights)} weights, expected {len(feats)}"
        )
    z = F.lit(float(model["bias"]))
    for w, f in zip(weights, feats):
        z = z + F.lit(float(w)) * f
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def gate_by_quality_model(
    df: DataFrame,
    text_col: str,
    model: dict,
    threshold: float = 0.5,
    score_col: str | None = None,
) -> DataFrame:
    """Filter to rows scoring ≥ ``threshold``; optionally keep the score
    in ``score_col``. Map-only — composes with scans and every
    downstream gate without a shuffle.

    Fails CLOSED on degenerate text (r12, out-of-distribution
    hardening): a token-empty document's features are all zero, so its
    score is ``sigmoid(bias)`` — an artifact of the bias term, not
    evidence of quality — and a NULL text scores NULL; both are dropped
    regardless of threshold. A corpus gate must never keep an empty doc
    because the trained intercept happened to be positive. Pinned in
    tests/test_quality_model.py."""
    score = score_quality_model(F.col(text_col), model)
    has_tokens = token_count(F.col(text_col)) > 0
    if score_col is not None:
        df = df.withColumn(score_col, score)
        return df.filter(has_tokens & (F.col(score_col) >= threshold))
    return df.filter(has_tokens & (score >= threshold))
