"""URL canonicalization and domain functions for crawl curation.

The reference engine has no URL toolkit; this is part of the
beyond-reference 100 TB pipeline layer: a web crawl dedups first on the
CANONICAL URL (the same page is fetched as ``http://…``, ``https://…``,
``…?utm_source=feed``, ``…#section`` — byte-different, one document),
then caps and mixes by REGISTERED DOMAIN so one host cannot dominate
the corpus (compose with ``sampling.cap_per_key`` / ``mix_to_weights``).

Everything here is a pure Column expression — JVM-side, whole-stage
codegen, zero UDFs — so canonicalization runs at scan speed on all
executors and every function has an exact DuckDB SQL oracle
(``__spark_entry__._sql_url_canonicalize``).

Normalization contract (documented, deliberately conservative):
  1. trim; drop the ``#fragment``
  2. scheme lowercased; a URL with no ``scheme://`` yields NULL
  3. userinfo (``user:pass@``) stripped; host lowercased
  4. default ports dropped (``:80`` for http, ``:443`` for https);
     other ports kept. No IPv6-literal support (``[::1]`` hosts come
     out mangled — guard upstream if you crawl those)
  5. empty path becomes ``/``; path case/encoding otherwise preserved
     (percent-decoding is NOT attempted — decoding changes identity)
  6. query params split on ``&``; empties and tracking params dropped
     (``utm_*`` prefix plus the ``_TRACKING_PARAMS`` set), the rest
     SORTED (param order is almost never semantic; sorting merges the
     permutations ad systems emit)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# exact-name tracking params dropped by url_normalize (utm_* handled by
# prefix); keep in sync with the DuckDB oracle in __spark_entry__
_TRACKING_PARAMS = (
    "fbclid", "gclid", "msclkid", "dclid", "igshid", "mc_cid", "mc_eid",
    "ref", "ref_src", "spm", "yclid",
)

# common two-level public suffixes for the registered-domain heuristic.
# NOT the full public-suffix list (that's a data file, not code) — this
# covers the high-traffic ccTLD second-level registries; everything else
# falls back to eTLD+1 = last two labels.
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in",
    "co.za", "org.za",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.kr", "or.kr", "com.my", "co.id", "co.th", "com.vn",
    "com.ph", "com.sa", "co.il", "org.il", "com.pk", "com.bd",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme of ``url``; empty string when there is none."""
    return F.lower(F.regexp_extract(F.trim(url), _SCHEME_RE, 1))


def _after_scheme(url: Column) -> Column:
    u = F.split(F.trim(url), "#", 2)[0]
    return F.regexp_replace(u, _SCHEME_RE, "")


def url_host(url: Column) -> Column:
    """Lowercased host: authority minus userinfo and port. NULL when the
    URL has no ``scheme://``."""
    auth = F.regexp_extract(_after_scheme(url), r"^([^/?]*)", 1)
    host = F.element_at(F.split(auth, "@"), -1)
    host = F.lower(F.split(host, ":", 2)[0])
    return F.when(url_scheme(url) != "", host)


def registered_domain(host: Column) -> Column:
    """eTLD+1 heuristic over a HOST (not a full URL): last two labels,
    or last three when the last two form a known two-level public suffix
    (``example.co.uk`` → ``example.co.uk``, not ``co.uk``). Pass-through
    for single-label hosts (``localhost``). NULL host → NULL."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when((n >= 3) & last2.isin(*_TWO_LEVEL_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def url_registered_domain(url: Column) -> Column:
    """``registered_domain(url_host(url))``."""
    return registered_domain(url_host(url))


def _clean_query(query: Column) -> Column:
    """Split on ``&``, drop empties / ``utm_*`` / tracking names, sort,
    rejoin."""
    parts = F.split(query, "&")
    name = lambda p: F.split(p, "=", 2)[0]  # noqa: E731
    kept = F.filter(
        parts,
        lambda p: (p != "")
        & ~name(p).startswith("utm_")
        & ~name(p).isin(*_TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(kept), "&")


def url_normalize(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract (see the module
    docstring for the exact rule list). NULL when ``url`` is NULL or has
    no ``scheme://``. Pure expression — composes into scans, joins, and
    ``exact_dedup(df, "url_norm", id_col)``."""
    scheme = url_scheme(url)
    rest = _after_scheme(url)
    auth = F.regexp_extract(rest, r"^([^/?]*)", 1)
    after_auth = F.regexp_replace(rest, r"^[^/?]*", "")
    hostport = F.element_at(F.split(auth, "@"), -1)
    hp = F.split(hostport, ":", 2)
    host = F.lower(hp[0])
    port = F.when(F.size(hp) == 2, hp[1]).otherwise(F.lit(""))
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    netloc = F.when(
        (port == "") | default_port, host
    ).otherwise(F.concat(host, F.lit(":"), port))
    path = F.regexp_extract(after_auth, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    has_q = after_auth.contains("?")
    query = F.when(has_q, F.regexp_replace(after_auth, r"^[^?]*\?", "")).otherwise(
        F.lit("")
    )
    qn = _clean_query(query)
    out = F.concat(
        scheme, F.lit("://"), netloc, path,
        F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", out)
