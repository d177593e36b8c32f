"""Trainable quality classifier (functions/quality_model.py)."""
import pytest
from pyspark.sql import functions as F

from lotus_spark.functions.quality_model import (
    QUALITY_FEATURES,
    gate_by_quality_model,
    quality_feature_cols,
    score_quality_model,
    train_quality_model,
)

GOOD = [
    "the quick brown fox jumps over the lazy dog and rests in the shade",
    "she walked to the market in the morning and bought fresh bread",
    "a long journey begins with a single step taken with great care",
    "the committee discussed the proposal and agreed on the main points",
    "he read the letter twice before answering with a careful reply",
    "the river flows gently past the old mill near the quiet village",
]
BAD = [
    "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( )))",
    "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxx 1234567890 §±¶",
    "buy now 77777 $$$$ click click 99999 !!!!",
    ">>>> <<<< ==== ++++ |||| ~~~~ ????",
    "0101010101 #### $$$$ %%%% 0x0x0x0x0x",
    "zzzz qqqq 9999 ---- ____ ++++ &&&&",
]


def _labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "id long, text string, label int")


def test_train_separates_good_from_bad(spark):
    df = _labeled(spark)
    model = train_quality_model(df, "text", "label")
    assert model["features"] == list(QUALITY_FEATURES)
    assert len(model["weights"]) == len(QUALITY_FEATURES)
    scored = df.select(
        "label", score_quality_model(F.col("text"), model).alias("p")
    ).collect()
    acc = sum((r["p"] >= 0.5) == (r["label"] == 1) for r in scored) / len(scored)
    assert acc >= 0.9


def test_expression_score_matches_mllib_probability(spark):
    """The literal-baked sigmoid expression must reproduce MLlib's own
    transform probabilities — the bake-as-literals inference path is
    exactly the fitted model, not an approximation."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector, vector_to_array

    df = _labeled(spark)
    model = train_quality_model(df, "text", "label")
    feats = quality_feature_cols(F.col("text"))
    vec = df.select(
        "id",
        F.col("label").cast("double").alias("label"),
        array_to_vector(F.array(*feats)).alias("features"),
    )
    lr = LogisticRegression(maxIter=100, regParam=0.0,
                            standardization=False, family="binomial")
    m = lr.fit(vec)
    probs = m.transform(vec).select(
        "id", vector_to_array("probability")[1].alias("p_ml")
    )
    ours = df.select(
        "id", score_quality_model(F.col("text"), model).alias("p_expr")
    )
    joined = probs.join(ours, "id").select(
        F.max(F.abs(F.col("p_ml") - F.col("p_expr"))).alias("maxerr")
    ).collect()[0]
    assert joined["maxerr"] < 1e-9


def test_gate_by_quality_model_threshold_and_score_col(spark):
    df = _labeled(spark)
    model = train_quality_model(df, "text", "label")
    kept = gate_by_quality_model(df, "text", model, 0.5, score_col="q")
    assert "q" in kept.columns
    ids = sorted(r["id"] for r in kept.collect())
    assert all(i < 100 for i in ids) and len(ids) >= 5


def test_score_rejects_weight_mismatch(spark):
    with pytest.raises(ValueError):
        score_quality_model(F.lit("x"), {"weights": [1.0], "bias": 0.0})


def test_handcrafted_model_is_deterministic_expression(spark):
    """Fixed literal weights → pure expression; same input, same score,
    no training or model object involved (the oracle-row path)."""
    model = {"weights": [3.0, 2.0, -0.05, 0.1], "bias": -2.0,
             "features": list(QUALITY_FEATURES)}
    df = spark.createDataFrame([(1, GOOD[0]), (2, BAD[0])], ["id", "text"])
    out = {r["id"]: r["p"] for r in df.select(
        "id", score_quality_model(F.col("text"), model).alias("p")
    ).collect()}
    assert out[1] > out[2]
    again = {r["id"]: r["p"] for r in df.select(
        "id", score_quality_model(F.col("text"), model).alias("p")
    ).collect()}
    assert out == again
