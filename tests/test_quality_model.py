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


def test_gate_fails_closed_on_out_of_distribution_text(spark):
    """r11 verdict item 7: the classifier is trained on the repo's own
    synthetic labels, so out-of-distribution text (empty/near-empty,
    NULL, non-Latin, code) must fail CLOSED at the gate — never kept on
    the bias term alone — and scores must be defined (non-NULL, [0,1])
    for every non-NULL text."""
    df = _labeled(spark)
    model = train_quality_model(df, "text", "label")

    ood = spark.createDataFrame(
        [
            (0, ""),                          # token-empty
            # space-only: Spark's trim strips SPACES only (a tab-only
            # text "tokenizes" to empty-string tokens under the shared
            # split convention, same as the DuckDB oracle — that case
            # is scored, not gated, by design)
            (1, "      "),
            (2, None),                        # NULL text
            (3, "你好世界 这是一段没有拉丁字母的中文文本 统计特征全部越界"),
            (4, "def f(x):\n    return x * 2  # code, not prose"),
            (5, "a"),                         # near-empty
            (6, GOOD[0]),                     # in-distribution control
        ],
        "id long, text string",
    )
    scored = {
        r["id"]: r["p"]
        for r in ood.select(
            "id", score_quality_model(F.col("text"), model).alias("p")
        ).collect()
    }
    # scores are total for non-NULL text: defined and in [0, 1]
    for i in (0, 1, 3, 4, 5, 6):
        assert scored[i] is not None and 0.0 <= scored[i] <= 1.0, i
    assert scored[2] is None  # NULL text scores NULL...

    kept = {r["id"] for r in
            gate_by_quality_model(ood, "text", model, 0.0).collect()}
    # ...and the gate drops NULL and token-empty rows EVEN AT
    # threshold 0 (fail closed): membership is decided by the
    # has-tokens guard, not by whatever sigmoid(bias) happens to be
    assert 0 not in kept and 1 not in kept and 2 not in kept
    assert 6 in kept  # real prose still passes

    # a deliberately positive-bias model must not resurrect empties
    biased = {"weights": [0.0, 0.0, 0.0, 0.0], "bias": 5.0,
              "features": list(QUALITY_FEATURES)}
    kept_b = {r["id"] for r in
              gate_by_quality_model(ood, "text", biased, 0.5).collect()}
    assert 0 not in kept_b and 1 not in kept_b and 2 not in kept_b
