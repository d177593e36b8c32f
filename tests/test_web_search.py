"""Web search source: engine registry, normalized results DataFrame, and
distributed web_extract (hermetic — injected fake engine + fetcher)."""

import pytest

from lotus_spark.sources import register_engine, web_extract, web_search
from lotus_spark.sources.web_search import RESULT_FIELDS, engines


def _fake_engine(query, K):
    return [
        {
            "id": f"{query}-{i}",
            "title": f"Result {i} for {query}",
            "snippet": f"snippet {i}",
            "url": f"https://example.org/{query}/{i}",
            "date": None,
            "source": "fake",
        }
        for i in range(K + 2)  # over-return: web_search must clamp to K
    ]


register_engine("fake", _fake_engine)


def test_web_search_normalizes_and_clamps(spark):
    df = web_search(spark, "fake", "spark", K=3, delay=0)
    assert df.columns == ["query"] + list(RESULT_FIELDS)
    rows = df.collect()
    assert len(rows) == 3  # clamped to K despite the engine over-returning
    assert rows[0]["query"] == "spark"
    assert rows[0]["url"] == "https://example.org/spark/0"
    assert rows[0]["date"] is None


def test_web_search_multi_query(spark):
    df = web_search(spark, "FAKE", ["a", "b"], K=2, delay=0)  # case-insensitive
    got = {(r["query"], r["id"]) for r in df.collect()}
    assert got == {("a", "a-0"), ("a", "a-1"), ("b", "b-0"), ("b", "b-1")}


def test_web_search_unknown_corpus(spark):
    with pytest.raises(ValueError, match="unknown search corpus"):
        web_search(spark, "altavista", "q", K=1)
    assert "arxiv" in engines() and "fake" in engines()


def test_web_extract_distributed_fetch(spark):
    df = web_search(spark, "fake", "x", K=4, delay=0)

    def fetcher(url):
        if url.endswith("/2"):
            raise RuntimeError("boom")  # per-row failure → None, not fatal
        return f"TEXT<{url}>" * 50

    out = web_extract(df, fetcher=fetcher, max_length=30, delay=0)
    by_id = {r["id"]: r["full_text"] for r in out.collect()}
    assert by_id["x-2"] is None
    assert by_id["x-0"] == ("TEXT<https://example.org/x/0>" * 50)[:30]
    assert len(by_id["x-1"]) == 30  # max_length enforced
