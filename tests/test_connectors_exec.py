"""Executed (not plan-only) connector tests — round-3 verdict item 6.

JDBC runs against embedded Derby (the driver Spark's distribution ships
for the Hive metastore, so no extra jar); the object-store connector runs
with ``scheme="file"`` through the identical reader code path that an
``s3a://`` read takes. Both suites auto-skip when the environment lacks
the prerequisite (Derby jar / writable tmp).
"""

import pytest
from pyspark.sql import functions as F

from lotus_spark.sources.connectors import load_from_db, load_from_s3

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("embedded Derby jar not on the Spark classpath")
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db_dir};create=true"
    # populate through Spark's own JDBC writer — real end-to-end JDBC
    # uppercase column names: Spark's JDBC writer quotes identifiers, and
    # Derby resolves unquoted query references to uppercase
    df = spark.createDataFrame(
        [(i, f"name_{i}", i * 10) for i in range(100)],
        ["ID", "NAME", "SCORE"],
    )
    (df.write.format("jdbc")
       .option("url", url)
       .option("dbtable", "people")
       .option("driver", DERBY_DRIVER)
       .mode("overwrite")
       .save())
    return url


def test_jdbc_roundtrip_query(spark, derby_url):
    out = load_from_db(
        spark, derby_url,
        "SELECT id, name FROM people WHERE score >= 500",
        driver=DERBY_DRIVER,
    )
    rows = sorted((r["ID"], r["NAME"]) for r in out.collect())
    assert len(rows) == 50
    assert rows[0] == (50, "name_50")


def test_jdbc_partitioned_read(spark, derby_url):
    """Range-partitioned parallel read — 'query' + partitionColumn is
    rejected by Spark, so this exercises the dbtable-subquery path."""
    out = load_from_db(
        spark, derby_url,
        "SELECT id, score FROM people",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
        driver=DERBY_DRIVER,
    )
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 100
    assert out.agg(F.sum("SCORE")).collect()[0][0] == sum(i * 10 for i in range(100))


@pytest.fixture(scope="module")
def local_bucket(spark, tmp_path_factory):
    bucket = tmp_path_factory.mktemp("bucket")
    df = spark.createDataFrame(
        [(i, f"row {i}") for i in range(20)], ["id", "body"]
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(bucket / "data.parquet"))
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(
        str(bucket / "data.csv"))
    return str(bucket)


def test_object_store_parquet(spark, local_bucket):
    out = load_from_s3(spark, local_bucket, "data.parquet", scheme="file")
    assert out.count() == 20
    assert set(out.columns) == {"id", "body"}


def test_object_store_csv_options(spark, local_bucket):
    out = load_from_s3(spark, local_bucket, "data.csv", file_format="csv",
                       scheme="file")
    assert out.count() == 20
    # header + inferSchema defaults applied on the executed read
    assert dict(out.dtypes)["id"] == "int"


def test_object_store_rejects_unknown_format(spark, local_bucket):
    with pytest.raises(ValueError, match="unsupported format"):
        load_from_s3(spark, local_bucket, "data.xyz", scheme="file")


# ------------------------------------------------------- xlsx fallback ----

def test_xlsx_driver_side_bytes_roundtrip(spark, tmp_path):
    """xlsx flows through the Hadoop-FS byte fetch + createDataFrame path
    (reference connectors.py:78 reads xlsx driver-side via pd.read_excel).
    The parse tier is injectable: this exercises the whole pipeline with a
    hermetic parser and asserts the EXACT bytes reach it."""
    import pandas as pd

    payload = b"PK\x03\x04 not-really-a-zip " + bytes(range(256))
    (tmp_path / "book.xlsx").write_bytes(payload)
    seen = {}

    def parser(data: bytes) -> pd.DataFrame:
        seen["data"] = data
        return pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})

    out = load_from_s3(spark, str(tmp_path), "book.xlsx", scheme="file",
                       parser=parser)
    assert seen["data"] == payload
    assert sorted((r["a"], r["b"]) for r in out.collect()) == \
        [(1, "x"), (2, "y")]


def _write_minimal_xlsx(path, header, rows):
    """Hand-rolled SpreadsheetML zip: shared-string header + typed body
    cells (strings via sharedStrings, numbers inline)."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    strings: list[str] = []

    def sref(s):
        strings.append(s)
        return len(strings) - 1

    def cell(col, rownum, v):
        ref = f"{chr(ord('A') + col)}{rownum}"
        if isinstance(v, str):
            return f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    body = "".join(
        f'<row r="{i + 1}">'
        + "".join(cell(j, i + 1, v) for j, v in enumerate(vals))
        + "</row>"
        for i, vals in enumerate([list(header)] + [list(r) for r in rows])
    )
    sheet = f"<worksheet {ns}><sheetData>{body}</sheetData></worksheet>"
    sst = (
        f"<sst {ns}>"
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)


def test_xlsx_stdlib_fallback_parses_real_zip(spark, tmp_path):
    """Without openpyxl the default tier falls back to the stdlib
    SpreadsheetML parser — a genuine xlsx (zip of sheet XML + shared
    strings) reads end-to-end through load_from_s3 with no optional
    dependency."""
    from lotus_spark.sources.connectors import _parse_xlsx_stdlib

    _write_minimal_xlsx(
        tmp_path / "table.xlsx",
        ["id", "name", "score"],
        [[1, "alpha", 0.5], [2, "beta", 1.25], [3, "gamma", -2.0]],
    )
    out = load_from_s3(spark, str(tmp_path), "table.xlsx", scheme="file")
    got = sorted((int(r["id"]), r["name"], r["score"])
                 for r in out.collect())
    assert got == [(1, "alpha", 0.5), (2, "beta", 1.25), (3, "gamma", -2.0)]

    # parser unit level: header becomes columns, numbers are floats
    pdf = _parse_xlsx_stdlib((tmp_path / "table.xlsx").read_bytes())
    assert list(pdf.columns) == ["id", "name", "score"]
    assert pdf["id"].tolist() == [1.0, 2.0, 3.0]


def test_xlsx_pd_options_require_openpyxl(spark, tmp_path, monkeypatch):
    """Round-5 advice: when openpyxl is absent, caller-supplied
    pd_options (sheet_name, header, ...) must NOT be silently dropped by
    the stdlib fallback — the same call would return materially
    different data depending on installed libraries. It raises instead;
    the option-free call still parses via the stdlib tier."""
    import sys

    import pytest

    _write_minimal_xlsx(
        tmp_path / "opts.xlsx", ["a", "b"], [[1, "x"], [2, "y"]]
    )
    # force the no-openpyxl branch regardless of the environment
    monkeypatch.setitem(sys.modules, "openpyxl", None)
    with pytest.raises(ImportError, match="openpyxl"):
        load_from_s3(spark, str(tmp_path), "opts.xlsx", scheme="file",
                     sheet_name=0)
    out = load_from_s3(spark, str(tmp_path), "opts.xlsx", scheme="file")
    assert out.count() == 2


def test_xlsx_stdlib_spacer_row_and_wide_body(tmp_path):
    """A blank spacer row above the table must not crash (empty-dict max)
    and body cells right of the header's last column get generated names
    instead of vanishing (round-5 review finding)."""
    import zipfile

    from lotus_spark.sources.connectors import _parse_xlsx_stdlib

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f"<worksheet {ns}><sheetData>"
        '<row r="1"></row>'  # spacer: no cells
        '<row r="2"><c r="A2" t="inlineStr"><is><t>id</t></is></c>'
        '<c r="B2" t="inlineStr"><is><t>name</t></is></c></row>'
        '<row r="3"><c r="A3"><v>1</v></c>'
        '<c r="B3" t="inlineStr"><is><t>x</t></is></c>'
        '<c r="C3"><v>9.5</v></c></row>'  # wider than header
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(tmp_path / "w.xlsx", "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    pdf = _parse_xlsx_stdlib((tmp_path / "w.xlsx").read_bytes())
    assert list(pdf.columns) == ["id", "name", "col2"]
    assert pdf.iloc[0].tolist() == [1.0, "x", 9.5]


def test_xlsx_real_parse_tier(spark, tmp_path):
    """Real pd.read_excel tier — runs wherever openpyxl is installed."""
    openpyxl = pytest.importorskip("openpyxl")
    import pandas as pd

    pd.DataFrame({"id": [1, 2, 3], "name": ["a", "b", "c"]}).to_excel(
        tmp_path / "real.xlsx", index=False, engine=openpyxl.__name__)
    out = load_from_s3(spark, str(tmp_path), "real.xlsx", scheme="file")
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]


# ------------------------------------------------------- URL ingestion ----

@pytest.fixture()
def http_docs(tmp_path_factory):
    """Local HTTP server serving two small documents."""
    import http.server
    import threading

    docroot = tmp_path_factory.mktemp("docroot")
    (docroot / "notes.txt").write_text("hello from the web")
    (docroot / "readme.md").write_text("# remote doc\n\nbody text")

    handler = type(
        "H", (http.server.SimpleHTTPRequestHandler,),
        {"directory": str(docroot),
         "log_message": lambda self, *a: None},
    )
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), lambda *a, **kw: handler(*a, directory=str(docroot), **kw))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


def test_load_files_from_urls(spark, http_docs):
    """add_url parity (reference directory_reader.py:141+): remote docs
    download once and run through the identical binaryFile scan +
    extractor registry as local files."""
    from lotus_spark.sources.connectors import load_files

    out = load_files(
        spark, urls=[f"{http_docs}/notes.txt", f"{http_docs}/readme.md"])
    rows = {r["file_path"].rsplit("_", 1)[-1]: r for r in out.collect()}
    assert rows["notes.txt"]["content"] == "hello from the web"
    assert rows["readme.md"]["content"].startswith("# remote doc")
    # provenance: each downloaded row carries its SOURCE URL, not just
    # the driver temp path (round-5 review finding)
    assert rows["notes.txt"]["source_url"] == f"{http_docs}/notes.txt"
    assert rows["readme.md"]["source_url"] == f"{http_docs}/readme.md"


def test_load_files_path_and_urls_compose(spark, http_docs, tmp_path):
    from lotus_spark.sources.connectors import load_files

    (tmp_path / "local.txt").write_text("local doc")
    out = load_files(spark, str(tmp_path),
                     urls=[f"{http_docs}/notes.txt"])
    contents = sorted(r["content"] for r in out.collect())
    assert contents == ["hello from the web", "local doc"]
    # local rows have no source_url
    srcs = {r["content"]: r["source_url"] for r in out.collect()}
    assert srcs["local doc"] is None
    assert srcs["hello from the web"] == f"{http_docs}/notes.txt"


def test_load_files_glob_does_not_filter_urls(spark, http_docs, tmp_path):
    """glob applies to the PATH scan only: an explicitly requested URL
    whose name doesn't match must still be ingested (round-5 review
    finding — pathGlobFilter used to drop it silently)."""
    from lotus_spark.sources.connectors import load_files

    (tmp_path / "keep.txt").write_text("kept local")
    (tmp_path / "skip.md").write_text("skipped local")
    out = load_files(spark, str(tmp_path), glob="*.txt",
                     urls=[f"{http_docs}/readme.md"])
    contents = sorted(r["content"] for r in out.collect())
    assert contents == ["# remote doc\n\nbody text", "kept local"]


def test_load_files_requires_source(spark):
    from lotus_spark.sources.connectors import load_files

    with pytest.raises(ValueError, match="path, urls"):
        load_files(spark)
