"""Structured response_format outputs → typed columns
(operators/structured.py; reference sem_agg.py:471-484 +
llm_as_judge.py:16-115, Spark spelling per SURVEY §1.2:
from_json(answer, schema) → typed field columns)."""
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from lotus_spark.models.structured_lms import (
    StructuredJSONLM, TokenCountStructuredJudge,
)
from lotus_spark.operators.judge import llm_as_judge
from lotus_spark.operators.sem_agg import sem_agg
from lotus_spark.operators.sem_map import sem_map
from lotus_spark.operators.structured import (
    response_format_lm_kwarg,
    response_format_schema,
    split_fields,
    strip_json_fences,
)

try:
    from pydantic import BaseModel

    class Score(BaseModel):
        points: int
        label: str
        weights: list[float]

    HAVE_PYDANTIC = True
except ImportError:  # pragma: no cover
    HAVE_PYDANTIC = False


def _docs(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "one two"),
        (2, " ".join(f"w{i}" for i in range(50))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- schema derivation -------------------------------------------------

def test_schema_from_ddl_structtype_and_dict(spark):
    want = StructType([StructField("score", LongType()),
                       StructField("verdict", StringType())])
    assert response_format_schema("score bigint, verdict string") == want
    assert response_format_schema(want) == want
    js = {"type": "object", "properties": {
        "score": {"type": "integer"}, "verdict": {"type": "string"}}}
    assert response_format_schema(js) == want
    arr = response_format_schema(
        {"type": "object",
         "properties": {"xs": {"type": "array",
                               "items": {"type": "number"}}}})
    assert arr["xs"].dataType == ArrayType(DoubleType())
    with pytest.raises(ValueError, match="JSON schema"):
        response_format_schema({"properties": {}})
    with pytest.raises(ValueError, match="must be a Spark StructType"):
        response_format_schema(42)
    # array-of-object recurses into a nested struct; unsupported items
    # types raise loudly instead of silently coercing to array<string>
    nested = response_format_schema(
        {"type": "object",
         "properties": {"hits": {"type": "array", "items": {
             "type": "object",
             "properties": {"id": {"type": "integer"},
                            "why": {"type": "string"}}}}}})
    assert nested["hits"].dataType == ArrayType(StructType([
        StructField("id", LongType()), StructField("why", StringType())]))
    with pytest.raises(ValueError, match="unsupported items type"):
        response_format_schema(
            {"type": "object",
             "properties": {"xs": {"type": "array",
                                   "items": {"type": "array"}}}})


@pytest.mark.skipif(not HAVE_PYDANTIC, reason="pydantic not installed")
def test_schema_from_pydantic_pep604_optional(spark):
    """PEP 604 optionals (int | None — types.UnionType, the common
    modern pydantic spelling) unwrap like typing.Optional."""
    from typing import Optional

    class MaybeScore(BaseModel):
        points: int | None
        label: Optional[str]
        tags: list[str] | None

    got = response_format_schema(MaybeScore)
    assert got == StructType([
        StructField("points", LongType()),
        StructField("label", StringType()),
        StructField("tags", ArrayType(StringType())),
    ])
    with pytest.raises(ValueError, match="unsupported Union"):
        class TwoTypes(BaseModel):
            x: int | str
        response_format_schema(TwoTypes)


@pytest.mark.skipif(not HAVE_PYDANTIC, reason="pydantic not installed")
def test_schema_from_pydantic_and_lm_kwarg_passthrough(spark):
    got = response_format_schema(Score)
    assert got == StructType([
        StructField("points", LongType()),
        StructField("label", StringType()),
        StructField("weights", ArrayType(DoubleType())),
    ])
    # pydantic classes forward VERBATIM (litellm's accepted spelling)
    assert response_format_lm_kwarg(Score) is Score


def test_lm_kwarg_for_spark_spellings_is_openai_json_schema(spark):
    k = response_format_lm_kwarg("score int, verdict string")
    assert k["type"] == "json_schema"
    props = k["json_schema"]["schema"]["properties"]
    assert props == {"score": {"type": "integer"},
                     "verdict": {"type": "string"}}
    assert k["json_schema"]["strict"] is True


def test_strip_json_fences(spark):
    df = spark.createDataFrame(
        [('```json\n{"a": 1}\n```',), ('  {"a": 2} ',)], "s string")
    got = [r["c"] for r in
           df.select(strip_json_fences(F.col("s")).alias("c")).collect()]
    assert got == ['{"a": 1}', '{"a": 2}']


# --- sem_map -----------------------------------------------------------

def test_sem_map_splits_fields_into_typed_columns(spark):
    out = sem_map(
        _docs(spark), "Judge the {text}",
        lm=TokenCountStructuredJudge(long_at=10),
        response_format="n_tokens bigint, verdict string",
    )
    assert dict(out.dtypes)["n_tokens"] == "bigint"
    rows = {r["doc_id"]: (r["n_tokens"], r["verdict"])
            for r in out.collect()}
    assert rows == {0: (3, "short"), 1: (2, "short"), 2: (50, "long")}
    # the raw JSON answer stays in the suffix column
    raw = json.loads(out.filter("doc_id = 0").first()["_map"])
    assert raw == {"n_tokens": 3, "verdict": "short"}


def test_sem_map_forwards_response_format_to_lm(spark):
    lm = StructuredJSONLM(
        lambda p, rf: {"rf_seen": rf is not None,
                       "rf_type": type(rf).__name__})
    out = sem_map(_docs(spark), "Check {text}", lm=lm,
                  response_format="rf_seen boolean, rf_type string")
    got = out.select("rf_seen", "rf_type").distinct().collect()
    assert [(r["rf_seen"], r["rf_type"]) for r in got] == [(True, "dict")]


def test_sem_map_malformed_json_yields_null_fields(spark):
    lm = StructuredJSONLM(lambda p, rf: {})  # emits "{}"
    broken = StructuredJSONLM.__new__(StructuredJSONLM)
    # a fake that answers non-JSON text
    from lotus_spark.models.fake_lm import FakeLM

    out = sem_map(_docs(spark), "Judge the {text}",
                  lm=FakeLM(lambda p: "not json at all"),
                  response_format="n_tokens bigint, verdict string")
    r = out.first()
    assert r["n_tokens"] is None and r["verdict"] is None
    assert r["_map"] == "not json at all"  # raw preserved
    out2 = sem_map(_docs(spark), "Judge the {text}", lm=lm,
                   response_format="n_tokens bigint")
    assert out2.first()["n_tokens"] is None  # missing field → NULL


def test_sem_map_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="CoT"):
        sem_map(docs, "Judge the {text}",
                lm=TokenCountStructuredJudge(), strategy="cot",
                response_format="n_tokens bigint")
    with pytest.raises(ValueError, match="collide"):
        sem_map(docs, "Judge the {text}",
                lm=TokenCountStructuredJudge(),
                response_format="text string, n long")
    # split off: just the raw JSON column, no field columns
    out = sem_map(docs, "Judge the {text}",
                  lm=TokenCountStructuredJudge(),
                  response_format="n_tokens bigint, verdict string",
                  split_fields_into_cols=False)
    assert "n_tokens" not in out.columns and "_map" in out.columns


@pytest.mark.skipif(not HAVE_PYDANTIC, reason="pydantic not installed")
def test_sem_map_with_pydantic_model(spark):
    # a pydantic model defined in a TEST module pickles by reference and
    # executors can't import tests/ — force by-value for this module
    # (user-defined response models live in importable modules)
    import sys

    from pyspark import cloudpickle  # the serializer Spark actually uses

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    lm = StructuredJSONLM(
        lambda p, rf: {"points": 7, "label": "ok", "weights": [0.5, 1.5]})
    out = sem_map(_docs(spark), "Score {text}", lm=lm,
                  response_format=Score)
    r = out.first()
    assert (r["points"], r["label"], r["weights"]) == (7, "ok", [0.5, 1.5])


# --- sem_agg -----------------------------------------------------------

def test_sem_agg_grouped_split_fields(spark):
    # fold fake: emits a JSON with the doc count folded upward is not
    # needed — single-level groups (each group fits one batch): the
    # answer is JSON of the serialized docs' token count
    lm = StructuredJSONLM(
        lambda p, rf: {"n_words": len(p.split()), "ok": True})
    df = spark.createDataFrame(
        [("a", "x x"), ("a", "y"), ("b", "z")], "g string, text string")
    out = sem_agg(df, "Summarize the {text}", lm=lm, group_by=["g"],
                  response_format="n_words bigint, ok boolean")
    assert set(out.columns) == {"g", "_output", "n_words", "ok"}
    got = {r["g"]: (r["n_words"] > 0, r["ok"]) for r in out.collect()}
    assert got == {"a": (True, True), "b": (True, True)}


def test_sem_agg_global_split_fields(spark):
    lm = StructuredJSONLM(lambda p, rf: {"n_chars": len(p)})
    out = sem_agg(_docs(spark), "Summarize the {text}", lm=lm,
                  response_format="n_chars bigint")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_chars"] > 0


# --- llm_as_judge ------------------------------------------------------

def test_llm_as_judge_structured_multi_trial(spark):
    out = llm_as_judge(
        _docs(spark), "Rate the {text}",
        lm=TokenCountStructuredJudge(long_at=10), n_trials=2,
        response_format="n_tokens bigint, verdict string",
    )
    for c in ("n_tokens_judge_0", "verdict_judge_0",
              "n_tokens_judge_1", "verdict_judge_1"):
        assert c in out.columns, c
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[2]["n_tokens_judge_0"] == 50 == r[2]["n_tokens_judge_1"]
    assert r[2]["verdict_judge_0"] == "long"
    assert r[0]["verdict_judge_1"] == "short"


def test_split_fields_field_suffix_collision(spark):
    df = spark.createDataFrame([('{"a": 1}', 5)], "j string, a_x long")
    with pytest.raises(ValueError, match="collide"):
        split_fields(df, "j", "a long", "t", field_suffix="_x")
    ok = split_fields(df, "j", "a long", "t", field_suffix="_y")
    assert ok.first()["a_y"] == 1
