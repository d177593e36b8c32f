"""Data connectors — the reference's ``DataConnector`` surface on Spark.

Reference (``lotus/data_connectors/connectors.py``):
- ``load_from_db(connection_url, query)`` via SQLAlchemy (:11-28)
- ``load_from_s3(...)`` reading csv/json/parquet/xlsx/txt via boto3 (:30-87)

Spark mapping: both collapse to native distributed readers — ``spark.read.jdbc``
(predicate-pushdown capable, partitioned reads via ``partitionColumn``) and
``spark.read.{csv,json,parquet,text}`` over ``s3a://`` URIs. Unlike the
reference's driver-side boto3 download, these scale out: S3 listing + reads
happen on executors, parquet gets column pruning + predicate pushdown.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"csv", "json", "parquet", "text", "orc"}


def load_from_db(
    spark: SparkSession,
    connection_url: str,
    query: str,
    partition_column: Optional[str] = None,
    num_partitions: int = 8,
    lower_bound: Optional[int] = None,
    upper_bound: Optional[int] = None,
    **options: Any,
) -> DataFrame:
    """Run ``query`` against a JDBC database; optionally range-partitioned so
    the read itself is parallel (the reference's SQLAlchemy read is serial)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", connection_url)
        .option("query", query)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def load_from_s3(
    spark: SparkSession,
    bucket: str,
    key: str,
    file_format: Optional[str] = None,
    endpoint_url: Optional[str] = None,
    aws_access_key: Optional[str] = None,
    aws_secret_key: Optional[str] = None,
    region: Optional[str] = None,
    **reader_options: Any,
) -> DataFrame:
    """Distributed read of ``s3a://bucket/key`` (csv/json/parquet/text/orc).

    Credentials/endpoint map to hadoop-aws configs (MinIO/R2 via endpoint).
    """
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if aws_access_key:
        conf.set("fs.s3a.access.key", aws_access_key)
    if aws_secret_key:
        conf.set("fs.s3a.secret.key", aws_secret_key)
    if endpoint_url:
        conf.set("fs.s3a.endpoint", endpoint_url)
        conf.set("fs.s3a.path.style.access", "true")
    if region:
        conf.set("fs.s3a.endpoint.region", region)

    fmt = file_format or key.rsplit(".", 1)[-1].lower()
    if fmt == "txt":
        fmt = "text"
    if fmt == "xlsx":
        raise NotImplementedError(
            "xlsx needs a spark-excel package; convert to csv/parquet upstream"
        )
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read
    if fmt == "csv":
        reader_options.setdefault("header", "true")
        reader_options.setdefault("inferSchema", "true")
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(f"s3a://{bucket}/{key}")


def load_files(
    spark: SparkSession,
    path: str,
    glob: Optional[str] = None,
    per_page: bool = True,
) -> DataFrame:
    """DirectoryReader-equivalent (reference
    ``lotus/file_extractors/directory_reader.py:141-571``): binary scan of a
    directory tree → one row per page with ``content``/``file_path``/
    ``page_label`` columns. PDF/DOCX parsing libs are not in this container,
    so extraction handles text-like files and falls back to a clearly marked
    stub for rich formats (the Spark plumbing — binaryFile scan, partitioned
    extraction, page explode — is real).
    """
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    binary = reader.load(path)

    out_schema = StructType(
        [
            StructField("file_path", StringType()),
            StructField("page_label", StringType()),
            StructField("content", StringType()),
        ]
    )

    def extract(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                fp = r["path"]
                ext = fp.rsplit(".", 1)[-1].lower()
                if ext in ("txt", "md", "csv", "json", "log", "py", "html"):
                    try:
                        text = bytes(r["content"]).decode("utf-8", errors="replace")
                    except Exception:
                        text = ""
                    pages = text.split("\f") if per_page else [text]
                    for i, page in enumerate(pages):
                        rows.append((fp, str(i + 1), page))
                else:
                    # rich-format extraction (pdf/docx/pptx) requires pymupdf
                    # et al. — not available here; emit a marker row so the
                    # pipeline shape is testable end-to-end
                    rows.append((fp, "1", f"[unextracted:{ext}]"))
            yield pd.DataFrame(rows, columns=["file_path", "page_label", "content"])

    return binary.select("path", "content").mapInPandas(extract, schema=out_schema)
