"""Tests for the hermetic WARC source (sources/warc.py)."""

import gzip

import pytest


def _record(wtype: str, uri: str, payload: bytes, rid: str) -> bytes:
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + ("Content-Type: application/http; msgtype=response\r\n"
           if wtype == "response" else "Content-Type: text/plain\r\n")
        + f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return headers + payload + b"\r\n\r\n"


HTTP_BODY = b"<html><body>hello crawl</body></html>"
HTTP_PAYLOAD = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
    b"Server: test\r\n\r\n" + HTTP_BODY
)


def _shard() -> bytes:
    return (
        _record("warcinfo", "", b"software: test\r\n", "aaa")
        + _record("response", "http://example.com/a", HTTP_PAYLOAD, "bbb")
        + _record("request", "http://example.com/a",
                  b"GET /a HTTP/1.1\r\n\r\n", "ccc")
        + _record("response", "http://example.com/b",
                  b"HTTP/1.1 404 Not Found\r\n\r\nmissing", "ddd")
    )


def test_load_warc_plain_and_gzip(spark, tmp_path):
    from lotus_spark.sources.warc import load_warc

    plain = tmp_path / "shard.warc"
    plain.write_bytes(_shard())
    # per-record gzip members (the Common Crawl layout)
    gz = tmp_path / "shard2.warc.gz"
    gz.write_bytes(b"".join(
        gzip.compress(_record("response", f"http://example.com/{i}",
                              b"HTTP/1.1 200 OK\r\n\r\nbody" + bytes([48 + i]),
                              f"gz{i}"))
        for i in range(3)
    ))

    got = load_warc(spark, str(plain), types=None)
    rows = {r["record_idx"]: r for r in got.collect()}
    assert len(rows) == 4
    assert rows[0]["warc_type"] == "warcinfo"
    assert rows[1]["target_uri"] == "http://example.com/a"
    assert bytes(rows[1]["content"]) == HTTP_PAYLOAD
    assert rows[3]["warc_type"] == "response"

    # default: response records only
    resp = load_warc(spark, str(plain))
    assert {r["target_uri"] for r in resp.collect()} == {
        "http://example.com/a", "http://example.com/b"}

    # gzip shard: multi-member stream, 3 records
    gz_rows = load_warc(spark, str(gz)).collect()
    assert len(gz_rows) == 3
    assert {bytes(r["content"])[-5:] for r in gz_rows} == {
        b"body0", b"body1", b"body2"}

    # whole directory in one call (2 files -> 7 records at types=None)
    all_rows = load_warc(spark, str(tmp_path), types=None).collect()
    assert len(all_rows) == 7


def test_load_warc_http_parsing_and_truncation(spark, tmp_path):
    from lotus_spark.sources.warc import load_warc

    plain = tmp_path / "http.warc"
    plain.write_bytes(_shard())
    got = {r["target_uri"]: r for r in load_warc(
        spark, str(plain), parse_http=True).collect()}
    a = got["http://example.com/a"]
    assert a["http_status"] == 200
    assert "Content-Type: text/html" in a["http_headers"]
    assert bytes(a["body"]) == HTTP_BODY
    assert got["http://example.com/b"]["http_status"] == 404

    # max_content_bytes bounds the payload at the parser
    trimmed = load_warc(spark, str(plain), max_content_bytes=10).collect()
    assert all(len(bytes(r["content"])) <= 10 for r in trimmed)


def test_load_warc_strict_on_malformed(spark, tmp_path):
    from lotus_spark.sources.warc import load_warc
    from pyspark.errors import PythonException

    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"NOT-A-WARC\r\njunk\r\n")
    with pytest.raises(PythonException, match="WARC"):
        load_warc(spark, str(bad), types=None).collect()

    short = tmp_path / "short.warc"
    short.write_bytes(
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nx")
    with pytest.raises(PythonException, match="Content-Length"):
        load_warc(spark, str(short), types=None).collect()


def test_warc_roundtrip_matches_duckdb_oracle(spark):
    """Cross-engine check of the r11-staged WARC oracle pair
    (__spark_entry__.q_warc_roundtrip / _SQL_WARC_ROUNDTRIP): per doc,
    the HTTP status, body byte length and body sha256 read back through
    the gzip-member WARC writer->parser->HTTP-split chain must equal
    DuckDB recomputing them from the text column directly — byte-level
    losslessness, driver-canonical compare."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    odf = con.execute(entry._SQL_WARC_ROUNDTRIP).df()
    sdf = entry.q_warc_roundtrip(spark, sf).toPandas()

    def canon(pdf):
        pdf = pdf[sorted(pdf.columns)].copy()
        for c in pdf.columns:
            pdf[c] = pdf[c].astype(str)
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)


def test_record_parser_streams_bounded(tmp_path):
    """r10-verdict item 2 (the load_warc memory bound): the incremental
    parser holds at most the current record's KEPT bytes — an oversized
    payload is truncated at max_content_bytes WHILE it streams past
    (the tail is counted off, never buffered), and a type-filtered
    record's payload is never buffered at all."""
    from lotus_spark.sources.warc import _RecordParser

    big = 10 << 20  # 10 MB declared payload
    head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"Content-Length: {big}\r\n\r\n").encode()
    parser = _RecordParser("t", {"response"}, max_content_bytes=16)
    rows = list(parser.feed(head))
    chunk = b"x" * (64 << 10)
    sent = 0
    while sent < big:
        n = min(len(chunk), big - sent)
        rows += parser.feed(chunk[:n])
        sent += n
        # buffer bound: never holds more than one in-flight chunk
        assert len(parser.buf) <= len(chunk)
        assert parser._content is None or len(parser._content) <= 16
    rows += parser.finish()
    assert len(rows) == 1 and rows[0][7] == b"x" * 16

    # filtered type: 10 MB request payload, nothing kept
    parser = _RecordParser("t", {"response"}, None)
    head = head.replace(b"WARC-Type: response", b"WARC-Type: request")
    rows = list(parser.feed(head))
    sent = 0
    while sent < big:
        n = min(len(chunk), big - sent)
        rows += parser.feed(chunk[:n])
        sent += n
        assert parser._content is None and len(parser.buf) <= len(chunk)
    assert parser.finish() == [] and rows == []


def test_iter_warc_records_no_full_inflation():
    """A multi-member gzip shard that inflates ~1000x parses without
    ever materializing the decompressed stream: tracemalloc peak while
    iterating stays bounded by O(chunk + one record), far under the
    ~50 MB inflation a decompress-then-parse design would hold."""
    import gzip as _gzip
    import io
    import tracemalloc

    from lotus_spark.sources.warc import _iter_warc_records

    rec_body = b"\x00" * (256 << 10)  # compresses ~1000x
    shard = b"".join(
        _gzip.compress(_record("response", f"http://e/{i}", rec_body,
                               f"m{i}"))
        for i in range(200)
    )  # ~50 MB decompressed
    tracemalloc.start()
    n = 0
    for rec in _iter_warc_records(io.BytesIO(shard), "t", None, None):
        assert len(rec[7]) == len(rec_body)
        n += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 200
    # chunk (1 MB) + one record (256 KB) + pandas/overhead slack
    assert peak < 8 << 20, f"peak {peak} bytes — shard was materialized?"


def test_load_warc_batched_output_parity(spark, tmp_path):
    """Chunked Arrow batches (batch_records/batch_bytes) change task
    memory, never the row set: a multi-record shard read with 2-row
    batches equals the default read."""
    from lotus_spark.sources.warc import load_warc

    p = tmp_path / "many.warc"
    p.write_bytes(b"".join(
        _record("response", f"http://e/{i}",
                b"HTTP/1.1 200 OK\r\n\r\nbody" + str(i).encode(), f"r{i}")
        for i in range(7)
    ))
    base = sorted(
        (r["target_uri"], bytes(r["content"]))
        for r in load_warc(spark, str(p)).collect())
    small = sorted(
        (r["target_uri"], bytes(r["content"]))
        for r in load_warc(spark, str(p), batch_records=2).collect())
    tiny = sorted(
        (r["target_uri"], bytes(r["content"]))
        for r in load_warc(spark, str(p), batch_bytes=8).collect())
    assert base == small == tiny and len(base) == 7


def test_html_to_text_expression(spark):
    """The WARC -> documents seam: script/style subtrees dropped, tags
    stripped, common entities decoded, whitespace collapsed — one pure
    Column expression (no UDF)."""
    from pyspark.sql import functions as F

    from lotus_spark.sources.warc import html_to_text

    html = ("<html><head><style>p {color: red}</style>"
            "<script>var x = '<p>no</p>';</script></head>"
            "<body><h1>Title</h1>\n<p>Hello &amp; welcome to "
            "<b>the</b>&nbsp;crawl &lt;3</p><!-- note --></body></html>")
    df = spark.createDataFrame([(html,)], ["raw"])
    got = df.select(html_to_text(F.col("raw")).alias("t")).first()["t"]
    assert got == 'Title Hello & welcome to the crawl <3'


def test_pipeline_ingest_matches_duckdb_oracle(spark):
    """The r11 crawl-front-half composition row (__spark_entry__.
    q_pipeline_ingest / _sql_pipeline_ingest): WARC parse + HTML
    extraction + Gopher gate + persisted-index dedup must hash-match
    DuckDB replaying the whole chain — driver-canonical compare."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    odf = con.execute(entry._sql_pipeline_ingest()).df()
    sdf = entry.q_pipeline_ingest(spark, sf).toPandas()

    def canon(pdf):
        pdf = pdf[sorted(pdf.columns)].copy()
        for c in pdf.columns:
            pdf[c] = pdf[c].astype(str)
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)


def test_load_warc_content_mode_parity(spark, tmp_path):
    """The remote-scheme byte source (binaryFile content column +
    in-memory streaming decode) must read identically to the
    local-stream mode — exercised via stream_local=False, since tests
    have no remote filesystem."""
    import gzip as _gzip

    from lotus_spark.sources.warc import load_warc

    gz = tmp_path / "shard.warc.gz"
    gz.write_bytes(b"".join(
        _gzip.compress(_record("response", f"http://e/{i}",
                               b"HTTP/1.1 200 OK\r\n\r\npayload%d" % i,
                               f"c{i}"))
        for i in range(5)
    ))
    local = sorted(
        (r["target_uri"], bytes(r["content"]))
        for r in load_warc(spark, str(gz), parse_http=False).collect())
    content = sorted(
        (r["target_uri"], bytes(r["content"]))
        for r in load_warc(spark, str(gz), parse_http=False,
                           stream_local=False).collect())
    assert local == content and len(local) == 5


def test_write_warc_roundtrip_and_member_layout(spark, tmp_path):
    """The export sink (r11): one row -> one spec-framed record, one
    task -> one shard of PER-RECORD gzip members (the layout load_warc
    streams). Roundtrip is byte-lossless, NULL content is skipped, the
    first gzip member ends after exactly one record (member layout,
    not one whole-shard stream), and a rewrite of the same partition
    is byte-identical (mtime pinned)."""
    import gzip as _gzip
    import zlib

    from lotus_spark.sources.warc import load_warc, write_warc

    rows = [(i, f"doc://{i}", f"text body {i} é") for i in range(7)]
    rows.append((7, "doc://7", None))  # NULL content skipped
    df = spark.createDataFrame(rows, ["doc_id", "uri", "text"]).coalesce(1)

    d1 = tmp_path / "out1"
    summary = write_warc(df, str(d1), "text", uri_col="uri")
    assert len(summary) == 1 and summary[0][1] == 7

    back = load_warc(spark, str(d1), types=("resource",))
    got = {r["target_uri"]: bytes(r["content"]).decode("utf-8")
           for r in back.collect()}
    assert got == {f"doc://{i}": f"text body {i} é" for i in range(7)}

    # per-record member layout: the FIRST member decompresses to
    # exactly one record (one WARC/1.0 header block)
    shard = (d1 / sorted(p.name for p in d1.iterdir())[0]).read_bytes()
    dec = zlib.decompressobj(wbits=31)
    first = dec.decompress(shard)
    assert first.count(b"WARC/1.0") == 1 and len(dec.unused_data) > 0

    # deterministic bytes for the same partition content
    d2 = tmp_path / "out2"
    write_warc(df, str(d2), "text", uri_col="uri")
    assert shard == (d2 / sorted(p.name for p in d2.iterdir())[0]).read_bytes()

    # binary content column + plain (uncompressed) mode
    bdf = spark.createDataFrame(
        [(b"\x00\x01binary",)], "content binary").coalesce(1)
    d3 = tmp_path / "out3"
    write_warc(bdf, str(d3), "content", gzip_members=False)
    raw = load_warc(spark, str(d3), types=None).collect()
    assert bytes(raw[0]["content"]) == b"\x00\x01binary"


def test_warc_export_roundtrip_matches_duckdb_oracle(spark):
    """The r12-staged sink row (__spark_entry__.q_warc_export_roundtrip
    / _SQL_WARC_EXPORT_ROUNDTRIP): distributed write_warc shards read
    back through load_warc must hash-match DuckDB recomputing byte
    length + sha256 from the text column — driver-canonical compare."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    odf = con.execute(entry._SQL_WARC_EXPORT_ROUNDTRIP).df()
    sdf = entry.q_warc_export_roundtrip(spark, sf).toPandas()

    def canon(pdf):
        pdf = pdf[sorted(pdf.columns)].copy()
        for c in pdf.columns:
            pdf[c] = pdf[c].astype(str)
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)
