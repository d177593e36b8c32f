"""URL canonicalization toolkit (functions/urls.py)."""
import pytest
from pyspark.sql import functions as F

from lotus_spark.functions.urls import (
    registered_domain,
    url_host,
    url_normalize,
    url_registered_domain,
    url_scheme,
)

CASES = [
    # (raw, normalized, host, registered domain)
    ("HTTPS://User:pw@WWW.News.Example.CO.UK:443/Docs/A%20b/"
     "?utm_source=f&z=26&a=1&fbclid=x#frag",
     "https://www.news.example.co.uk/Docs/A%20b/?a=1&z=26",
     "www.news.example.co.uk", "example.co.uk"),
    # non-default port kept; empty-value param kept; gclid dropped
    ("http://example.com:8080/x?b=2&gclid=1&a=",
     "http://example.com:8080/x?a=&b=2", "example.com", "example.com"),
    # default port dropped; empty path becomes /
    ("http://EXAMPLE.com:80", "http://example.com/",
     "example.com", "example.com"),
    # single-label host passes through registered_domain
    ("https://localhost/path", "https://localhost/path",
     "localhost", "localhost"),
    # non-http scheme: no default-port rule, plain eTLD+1
    ("ftp://Files.Example.ORG/a/b", "ftp://files.example.org/a/b",
     "files.example.org", "example.org"),
    # schemeless input → NULL everywhere (documented contract)
    ("no-scheme.example.com/x", None, None, None),
    (None, None, None, None),
]


def test_url_normalize_host_domain_table(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "i long, u string"
    )
    rows = (
        df.select(
            "i",
            url_normalize(F.col("u")).alias("n"),
            url_host(F.col("u")).alias("h"),
            url_registered_domain(F.col("u")).alias("d"),
        )
        .orderBy("i")
        .collect()
    )
    for r, (raw, n, h, d) in zip(rows, CASES):
        assert (r["n"], r["h"], r["d"]) == (n, h, d), raw


def test_url_normalize_idempotent(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES) if c[1] is not None],
        "i long, u string",
    )
    once = df.select("i", url_normalize(F.col("u")).alias("n"))
    twice = once.select("i", url_normalize(F.col("n")).alias("n2"))
    j = once.join(twice, "i").filter(F.col("n") != F.col("n2"))
    assert j.count() == 0


def test_url_scheme_and_param_order_merge(spark):
    # permuted query params canonicalize to the same URL (the ad-system
    # permutation case URL dedup exists for)
    df = spark.createDataFrame(
        [(0, "https://a.com/p?x=1&y=2"), (1, "https://a.com/p?y=2&x=1")],
        "i long, u string",
    )
    out = df.select(url_normalize(F.col("u")).alias("n")).distinct()
    assert out.count() == 1
    s = df.select(url_scheme(F.col("u")).alias("s")).distinct().collect()
    assert [r["s"] for r in s] == ["https"]


def test_registered_domain_on_bare_host_column(spark):
    df = spark.createDataFrame(
        [("a.b.co.jp",), ("x.y.z.com",), ("t.co",), (None,)], ["h"]
    )
    got = [
        r["d"]
        for r in df.select(registered_domain(F.col("h")).alias("d")).collect()
    ]
    assert got == ["b.co.jp", "z.com", "t.co", None]


def test_url_dedup_and_domain_cap_composition(spark):
    """The intended pipeline composition: canonical-URL exact dedup,
    then a per-registered-domain cap."""
    from lotus_spark.functions.dedup import exact_dedup
    from lotus_spark.functions.sampling import cap_per_key

    rows = [
        (0, "https://a.com/p?x=1&y=2", 10),
        (1, "https://A.COM:443/p?y=2&x=1&utm_source=f", 20),  # dup of 0
        (2, "https://a.com/q", 30),
        (3, "https://a.com/r", 40),
        (4, "https://b.org/s", 50),
    ]
    df = spark.createDataFrame(rows, ["id", "u", "score"])
    d = df.withColumn("url_norm", url_normalize(F.col("u")))
    d = exact_dedup(d, "url_norm", "id")
    assert d.count() == 4  # 0/1 collapsed
    capped = cap_per_key(
        d.withColumn("domain", url_registered_domain(F.col("u"))),
        "domain", 2, order_by="score", tiebreak="id",
    )
    got = sorted(r["id"] for r in capped.collect())
    assert got == [2, 3, 4]  # a.com capped to its 2 best, b.org intact
