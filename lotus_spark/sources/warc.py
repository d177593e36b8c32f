"""WARC (Web ARChive, ISO 28500) source — the crawl-corpus format.

Training-data pipelines start from crawl dumps shipped as WARC shards
(Common Crawl publishes ~1 GB ``.warc.gz`` files), so reading WARC is a
first-class source next to JDBC/s3a/files (``sources/connectors.py``).
This is a from-scratch parser of the public spec (record = a
``WARC/1.x`` version line, ``Name: value`` headers, a blank line, then
``Content-Length`` bytes of payload, then ``\\r\\n\\r\\n``) — no warcio
dependency, so it runs hermetically anywhere Spark does.

Scale design: WARC is not block-splittable without an external index
(records are variable-length and gzip members aren't aligned to
offsets), so the PARALLELISM UNIT IS THE FILE — exactly how production
crawl jobs shard (thousands of ~1 GB files; Spark schedules one task
per file via the ``binaryFile`` source). Within a task the parse is one
sequential pass. A whole (decompressed) shard must fit a task's memory
— the same bound the format's own sharding convention guarantees.
Compressed shards (per-record gzip members, the Common Crawl layout)
decompress transparently: multi-member gzip streams concatenate.

The reference has no WARC reader (its connectors stop at
files/S3/DBs); this extends the source surface the way a 100 TB
curation pipeline actually ingests.
"""

from __future__ import annotations

import gzip
from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame

WARC_SCHEMA = (
    "warc_file string, record_idx long, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, content binary"
)

HTTP_SCHEMA = WARC_SCHEMA + (
    ", http_status int, http_headers string, body binary"
)


def _parse_warc_bytes(
    buf: bytes,
    origin: str,
    types: Optional[set],
    max_content_bytes: Optional[int],
) -> list[tuple]:
    """One sequential pass over a decompressed WARC stream → record
    tuples. Strict: malformed framing raises with file+offset context
    (a silently half-read crawl shard is worse than a loud one)."""
    rows: list[tuple] = []
    i, n, rec_idx = 0, len(buf), 0
    while i < n:
        while i < n and buf[i : i + 1] in (b"\r", b"\n"):
            i += 1  # inter-record CRLF CRLF separators
        if i >= n:
            break
        eol = buf.find(b"\n", i)
        if eol < 0:
            raise ValueError(
                f"{origin}: truncated WARC version line at byte {i}")
        version = buf[i:eol].strip()
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"{origin}: expected a WARC/ version line at byte {i}, "
                f"found {version[:32]!r}")
        i = eol + 1
        headers: dict[str, str] = {}
        while True:
            eol = buf.find(b"\n", i)
            if eol < 0:
                raise ValueError(
                    f"{origin}: truncated WARC header block at byte {i}")
            line = buf[i:eol].rstrip(b"\r")
            i = eol + 1
            if not line:
                break
            key, _, val = line.partition(b":")
            headers[key.strip().lower().decode("ascii", "replace")] = (
                val.strip().decode("utf-8", "replace"))
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"{origin}: record {rec_idx} lacks a valid "
                "Content-Length header") from None
        if i + clen > n:
            raise ValueError(
                f"{origin}: record {rec_idx} declares Content-Length "
                f"{clen} but only {n - i} bytes remain")
        content = buf[i : i + clen]
        i += clen
        wtype = headers.get("warc-type", "")
        if types is None or wtype in types:
            if max_content_bytes is not None:
                content = content[:max_content_bytes]
            rows.append((
                origin,
                rec_idx,
                wtype,
                headers.get("warc-record-id", ""),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("content-type"),
                content,
            ))
        rec_idx += 1
    return rows


def _split_http(content: bytes) -> tuple[Optional[int], Optional[str], bytes]:
    """(status, headers text, body) from an HTTP message payload —
    ``application/http`` response records carry the raw HTTP exchange.
    Non-HTTP payloads come back as (None, None, content) unchanged."""
    if not content.startswith(b"HTTP/"):
        return None, None, content
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        sep = content.find(b"\n\n")
        body_at = sep + 2
    else:
        body_at = sep + 4
    if sep < 0:
        return None, None, content
    head = content[:sep].decode("latin-1")
    first = head.split("\r\n", 1)[0].split("\n", 1)[0]
    parts = first.split()
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    hdr_text = head.partition("\n")[2].strip()
    return status, hdr_text, content[body_at:]


def load_warc(
    spark,
    path: str,
    types: Optional[Sequence[str]] = ("response",),
    parse_http: bool = False,
    max_content_bytes: Optional[int] = None,
    recursive: bool = False,
) -> DataFrame:
    """Read WARC / WARC-gz shard(s) at ``path`` (file, dir, or glob —
    any Hadoop FS scheme) into one row per record.

    ``types`` filters by WARC-Type at the parser ("response" by default
    — the crawl-payload records; pass ``None`` for every record incl.
    warcinfo/request/metadata). ``parse_http=True`` additionally splits
    ``application/http`` payloads into (http_status, http_headers,
    body) — the body is what the text-extraction stage consumes.
    ``max_content_bytes`` truncates payloads at the parser (bound the
    row size before anything shuffles). Columns: warc_file, record_idx,
    warc_type, record_id, target_uri, warc_date, content_type, content
    [+ the http trio].
    """
    type_set = set(types) if types is not None else None
    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path).select("path", "content")

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["warc_file", "record_idx", "warc_type", "record_id",
                "target_uri", "warc_date", "content_type", "content"]
        if parse_http:
            cols += ["http_status", "http_headers", "body"]
        for pdf in it:
            rows = []
            for p, c in zip(pdf["path"], pdf["content"]):
                data = bytes(c)
                if data[:2] == b"\x1f\x8b":
                    # multi-member gzip (per-record members, the Common
                    # Crawl layout) concatenates transparently
                    data = gzip.decompress(data)
                recs = _parse_warc_bytes(
                    data, str(p), type_set, max_content_bytes)
                if parse_http:
                    recs = [
                        r + _split_http(r[-1]) for r in recs
                    ]
                rows.extend(recs)
            yield pd.DataFrame(rows, columns=cols)

    schema = HTTP_SCHEMA if parse_http else WARC_SCHEMA
    return files.mapInPandas(parse, schema=schema)


def html_to_text(col):
    """Crude-but-codegen HTML → text as a pure Column expression (the
    C4-style heuristic tier: drop script/style subtrees, strip tags,
    decode the common entities, collapse whitespace). Real pipelines
    swap in a proper extractor at this seam (trafilatura et al. — not
    in this container); the expression tier keeps the WARC → documents
    path runnable and JVM-side everywhere. Operates on STRING — decode
    the body first (``F.decode(body, "UTF-8")``)."""
    from pyspark.sql import functions as F

    txt = F.regexp_replace(
        col, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    txt = F.regexp_replace(txt, r"(?s)<!--.*?-->", " ")
    txt = F.regexp_replace(txt, r"(?s)<[^>]+>", " ")
    for ent, rep in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                     ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")):
        txt = F.replace(txt, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(txt, r"\s+", " "))
