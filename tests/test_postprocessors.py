from lotus_spark.operators.postprocessors import (
    parse_bool,
    parse_json_fields,
    split_cot,
)


def test_split_cot_plain():
    out = split_cot("Positive")
    assert out.answer == "Positive" and out.explanation is None


def test_split_cot_reasoning_answer():
    out = split_cot("Reasoning: it sounds happy\nAnswer: True")
    assert out.answer == "True"
    assert "happy" in out.explanation


def test_split_cot_think_tags():
    out = split_cot("<think>hmm ok</think>False")
    assert out.answer == "False" and out.explanation == "hmm ok"


def test_parse_bool_exact_and_fallback():
    assert parse_bool("True") is True
    assert parse_bool("False") is False
    assert parse_bool("garbage", default=True) is True
    assert parse_bool("garbage", default=False) is False
    assert parse_bool(None, default=True) is True


def test_parse_bool_cot_and_case():
    assert parse_bool("Reasoning: x\nAnswer: true") is True
    assert parse_bool("the answer is False.") is False


def test_parse_bool_custom_tokens():
    assert parse_bool("KEEP", output_tokens=("KEEP", "DROP")) is True
    assert parse_bool("DROP", output_tokens=("KEEP", "DROP")) is False


def test_parse_json_plain_and_fenced():
    assert parse_json_fields('{"a": "1"}', ["a", "b"]) == {"a": "1", "b": None}
    fenced = '```json\n{"a": "x"}\n```'
    assert parse_json_fields(fenced, ["a"]) == {"a": "x"}


def test_parse_json_embedded_and_coercion():
    assert parse_json_fields('noise {"a": 3} noise', ["a"]) == {"a": "3"}
    assert parse_json_fields("not json at all", ["a"]) == {"a": None}
