"""sem_map / sem_filter plumbing with deterministic fakes.

Mirrors the reference's canonical sentiment tests (``lm_tests.py:59-70``)
hermetically, as the reference itself does with fake completers.
"""

import pytest
from pyspark.sql import functions as F

import lotus_spark as ls
from lotus_spark.models import FakeLM, KeywordBoolLM, RegexMapLM, ScriptedLM


def test_sem_filter_keeps_positive_row(sentiment_df):
    out = ls.sem_filter(
        sentiment_df, "{Text} is a positive sentiment", lm=KeywordBoolLM("excited")
    )
    rows = out.collect()
    assert len(rows) == 1 and "excited" in rows[0]["Text"]


def test_sem_filter_return_all_labels(sentiment_df):
    out = ls.sem_filter(
        sentiment_df,
        "{Text} is a positive sentiment",
        lm=KeywordBoolLM("excited"),
        return_all=True,
    )
    got = {r["Text"]: r["_filter"] for r in out.collect()}
    assert sum(got.values()) == 1


def test_sem_filter_custom_tokens(sentiment_df):
    lm = ScriptedLM([("excited", "KEEP")], default="DROP")
    out = ls.sem_filter(
        sentiment_df,
        "{Text} is positive",
        lm=lm,
        output_tokens=("KEEP", "DROP"),
    )
    assert out.count() == 1


def test_sem_filter_default_on_garbage(sentiment_df):
    lm = FakeLM(lambda p: "unparseable!!")
    keep_all = ls.sem_filter(sentiment_df, "{Text} ok", lm=lm, default=True)
    drop_all = ls.sem_filter(sentiment_df, "{Text} ok", lm=lm, default=False)
    assert keep_all.count() == 2 and drop_all.count() == 0


def test_sem_filter_composes_with_native_filter(courses_df):
    # reference composition test: native filter then semantic op stays within
    native = courses_df.filter(F.col("Department") == "CS")
    # keyword must not appear in the instruction (the fake scans the prompt)
    out = ls.sem_filter(
        native, "{Course Name} teaches you to code", lm=KeywordBoolLM("programming")
    )
    names = {r["Course Name"] for r in out.collect()}
    assert names == {"Introduction to Programming", "Advanced Programming"}


def test_sem_map_suffix_and_explanations(sentiment_df):
    lm = FakeLM(lambda p: "Reasoning: because\nAnswer: Positive")
    out = ls.sem_map(
        sentiment_df,
        "sentiment of {Text}",
        lm=lm,
        suffix="_sentiment",
        return_explanations=True,
        return_raw_outputs=True,
    )
    r = out.collect()[0]
    assert r["_sentiment"] == "Positive"
    assert r["explanation_sentiment"] == "because"
    assert "Answer:" in r["raw_output_sentiment"]


def test_sem_map_examples_go_into_prompt(sentiment_df):
    seen = []

    def fn(prompt):
        seen.append(prompt)
        return "ok"

    examples = [("[Text]: «I love it»\n", "Positive", None)]
    ls.sem_map(sentiment_df, "sentiment of {Text}", lm=FakeLM(fn), examples=examples).collect()
    # few-shot examples ride in earlier turns; the final user turn holds the doc
    assert all("[Text]: «" in p for p in seen)


def test_missing_column_raises(sentiment_df):
    with pytest.raises(ValueError, match="Missing"):
        ls.sem_filter(sentiment_df, "{Missing} is positive", lm=KeywordBoolLM("x"))


def test_regex_map_lm_extracts_first_value(sentiment_df):
    out = ls.sem_map(
        sentiment_df, "first word of {Text}", lm=RegexMapLM(r"«(\w+)", "upper")
    )
    vals = {r["_map"] for r in out.collect()}
    assert vals == {"I"}
