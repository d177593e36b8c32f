"""Web search sources → Spark DataFrames.

Reference surface (``lotus/web_search.py:15-28,603-654,674+``): search one of
several corpora (GOOGLE / GOOGLE_SCHOLAR / ARXIV / YOU / BING / TAVILY /
PUBMED) for K results per query and return a DataFrame with a ``query``
column; ``web_extract`` fetches full text for result URLs.

Spark design: the search call itself is API-bound (one HTTP request per
query), so it runs driver-side and lands in ``spark.createDataFrame`` — the
same shape as the reference. The *fetch* side (``web_extract``) is data-
parallel over many URLs, so it runs as ``mapInPandas`` with a per-partition
politeness delay: on a cluster, thousands of document fetches fan out across
executors instead of serializing on the driver.

Engines are pluggable: ``register_engine(name, fn)`` installs a callable
``(query, K) -> list[dict]``; tests inject deterministic fakes, and the
bundled adapters (arxiv, pubmed public APIs; serpapi/bing/tavily/you keyed
APIs) lazily import ``requests`` and read their API keys from env vars only
when actually invoked.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

Engine = Callable[[str, int], list[dict]]

_ENGINES: dict[str, Engine] = {}

RESULT_FIELDS = ("id", "title", "snippet", "url", "date", "source")

_RESULT_SCHEMA = StructType(
    [StructField("query", StringType())]
    + [StructField(f, StringType()) for f in RESULT_FIELDS]
)


def register_engine(name: str, fn: Engine) -> None:
    _ENGINES[name.lower()] = fn


def engines() -> list[str]:
    return sorted(_ENGINES)


def web_search(
    spark: SparkSession,
    corpus: str,
    query: str | list[str],
    K: int,
    delay: float = 0.1,
) -> DataFrame:
    """Search ``corpus`` for each query; K results per query, normalized to
    ``(query, id, title, snippet, url, date, source)``."""
    fn = _ENGINES.get(corpus.lower())
    if fn is None:
        raise ValueError(f"unknown search corpus {corpus!r}; "
                         f"registered: {engines()}")
    queries = [query] if isinstance(query, str) else list(query)
    rows = []
    for i, q in enumerate(queries):
        if i and delay:
            time.sleep(delay)
        for rec in fn(q, K)[:K]:
            rows.append(tuple([q] + [
                None if rec.get(f) is None else str(rec.get(f))
                for f in RESULT_FIELDS
            ]))
    return spark.createDataFrame(rows, _RESULT_SCHEMA)


def web_extract(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "full_text",
    max_length: Optional[int] = None,
    delay: float = 0.1,
    fetcher: Optional[Callable[[str], Optional[str]]] = None,
) -> DataFrame:
    """Fetch full text for each row's URL — distributed over executors.

    ``fetcher(url) -> text|None`` is injectable (tests use a fake); the
    default fetches with requests and strips HTML tags. Each partition
    sleeps ``delay`` between fetches (politeness is per-task; cap
    partitions to cap global request rate)."""
    the_fetcher = fetcher or _default_fetcher
    out_schema = StructType(df.schema.fields + [StructField(text_col, StringType())])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for pdf in it:
            texts = []
            for url in pdf[url_col]:
                if not first and delay:
                    time.sleep(delay)
                first = False
                try:
                    t = the_fetcher(str(url)) if url is not None else None
                except Exception:
                    t = None
                if t is not None and max_length is not None:
                    t = t[:max_length]
                texts.append(t)
            pdf = pdf.copy()
            pdf[text_col] = texts
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _default_fetcher(url: str) -> Optional[str]:  # pragma: no cover - network
    try:
        import requests  # type: ignore
    except ImportError as e:
        raise RuntimeError("requests is not installed; pass fetcher=") from e
    resp = requests.get(url, timeout=30)
    resp.raise_for_status()
    ctype = resp.headers.get("content-type", "")
    if "html" in ctype:
        return _strip_html(resp.text)
    return resp.text


def _strip_html(html: str) -> str:
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self):
            super().__init__()
            self.parts: list[str] = []
            self._skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self._skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self._skip:
                self._skip -= 1

        def handle_data(self, data):
            if not self._skip and data.strip():
                self.parts.append(data.strip())

    x = _X()
    x.feed(html)
    return "\n".join(x.parts)


# ----------------------------------------------------------- real adapters
# Public-API corpora (no key): arxiv, pubmed. Keyed corpora read env vars at
# call time: SERPAPI_API_KEY (google/google_scholar), BING_API_KEY,
# TAVILY_API_KEY, YOU_API_KEY. All lazily import requests.

def _need_requests():
    try:
        import requests  # type: ignore
        return requests
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "requests is not installed; register a custom engine instead"
        ) from e


def _arxiv(query: str, K: int) -> list[dict]:  # pragma: no cover - network
    import xml.etree.ElementTree as ET

    requests = _need_requests()
    resp = requests.get(
        "http://export.arxiv.org/api/query",
        params={"search_query": f"all:{query}", "max_results": K},
        timeout=30,
    )
    resp.raise_for_status()
    ns = {"a": "http://www.w3.org/2005/Atom"}
    out = []
    for e in ET.fromstring(resp.text).findall("a:entry", ns):
        url = e.findtext("a:id", default="", namespaces=ns)
        out.append({
            "id": url.rsplit("/", 1)[-1],
            "title": (e.findtext("a:title", default="", namespaces=ns) or "").strip(),
            "snippet": (e.findtext("a:summary", default="", namespaces=ns) or "").strip(),
            "url": url,
            "date": e.findtext("a:published", default=None, namespaces=ns),
            "source": "arxiv",
        })
    return out


def _pubmed(query: str, K: int) -> list[dict]:  # pragma: no cover - network
    requests = _need_requests()
    base = "https://eutils.ncbi.nlm.nih.gov/entrez/eutils"
    ids = requests.get(
        f"{base}/esearch.fcgi",
        params={"db": "pubmed", "term": query, "retmax": K, "retmode": "json"},
        timeout=30,
    ).json()["esearchresult"].get("idlist", [])
    if not ids:
        return []
    summ = requests.get(
        f"{base}/esummary.fcgi",
        params={"db": "pubmed", "id": ",".join(ids), "retmode": "json"},
        timeout=30,
    ).json().get("result", {})
    return [{
        "id": i,
        "title": summ.get(i, {}).get("title"),
        "snippet": None,
        "url": f"https://pubmed.ncbi.nlm.nih.gov/{i}/",
        "date": summ.get(i, {}).get("pubdate"),
        "source": "pubmed",
    } for i in ids]


def _keyed_engine(source: str, env_var: str, build):  # pragma: no cover
    def fn(query: str, K: int) -> list[dict]:
        key = os.environ.get(env_var)
        if not key:
            raise ValueError(f"{env_var} is not set (needed for {source})")
        return build(_need_requests(), key, query, K)

    return fn


def _serpapi(engine_name: str):  # pragma: no cover - network
    def build(requests, key, query, K):
        resp = requests.get(
            "https://serpapi.com/search",
            params={"engine": engine_name, "q": query, "num": K, "api_key": key},
            timeout=30,
        )
        resp.raise_for_status()
        return [{
            "id": r.get("link"),
            "title": r.get("title"),
            "snippet": r.get("snippet"),
            "url": r.get("link"),
            "date": r.get("date"),
            "source": engine_name,
        } for r in resp.json().get("organic_results", [])]

    return build


def _bing(requests, key, query, K):  # pragma: no cover - network
    resp = requests.get(
        "https://api.bing.microsoft.com/v7.0/search",
        params={"q": query, "count": K},
        headers={"Ocp-Apim-Subscription-Key": key},
        timeout=30,
    )
    resp.raise_for_status()
    return [{
        "id": r.get("url"), "title": r.get("name"),
        "snippet": r.get("snippet"), "url": r.get("url"),
        "date": r.get("dateLastCrawled"), "source": "bing",
    } for r in resp.json().get("webPages", {}).get("value", [])]


def _tavily(requests, key, query, K):  # pragma: no cover - network
    resp = requests.post(
        "https://api.tavily.com/search",
        json={"api_key": key, "query": query, "max_results": K},
        timeout=30,
    )
    resp.raise_for_status()
    return [{
        "id": r.get("url"), "title": r.get("title"),
        "snippet": r.get("content"), "url": r.get("url"),
        "date": None, "source": "tavily",
    } for r in resp.json().get("results", [])]


def _you(requests, key, query, K):  # pragma: no cover - network
    resp = requests.get(
        "https://api.ydc-index.io/search",
        params={"query": query, "num_web_results": K},
        headers={"X-API-Key": key},
        timeout=30,
    )
    resp.raise_for_status()
    return [{
        "id": r.get("url"), "title": r.get("title"),
        "snippet": " ".join(r.get("snippets", []) or []) or None,
        "url": r.get("url"), "date": None, "source": "you",
    } for r in resp.json().get("hits", [])]


register_engine("arxiv", _arxiv)
register_engine("pubmed", _pubmed)
register_engine("google", _keyed_engine("google", "SERPAPI_API_KEY", _serpapi("google")))
register_engine("google_scholar",
                _keyed_engine("google_scholar", "SERPAPI_API_KEY",
                              _serpapi("google_scholar")))
register_engine("bing", _keyed_engine("bing", "BING_API_KEY", _bing))
register_engine("tavily", _keyed_engine("tavily", "TAVILY_API_KEY", _tavily))
register_engine("you", _keyed_engine("you", "YOU_API_KEY", _you))
