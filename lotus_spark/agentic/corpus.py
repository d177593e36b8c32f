"""Corpus / Unit — the agentic data model (reference ``lotus/corpus/__init__.py:24-84``).

``Unit(id, content, metadata)``; ``Corpus`` wraps a Spark DataFrame with
schema ``(id STRING, content STRING, metadata MAP<STRING,STRING>)``.
Loaders mirror the reference (``from_documents/from_dataframe/from_files/
from_text``); ``shard(size)`` becomes a shard-id column +
``repartition`` so one agent runs per shard *partition* on the cluster.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SCHEMA = "id string, content string, metadata map<string,string>"


class Unit:
    def __init__(self, id: str, content: str, metadata: Optional[dict] = None):
        self.id = str(id)
        self.content = content
        self.metadata = dict(metadata or {})

    def __repr__(self) -> str:  # pragma: no cover
        return f"Unit(id={self.id!r}, content={self.content[:40]!r}...)"


class Corpus:
    def __init__(self, df: DataFrame):
        missing = {"id", "content"} - set(df.columns)
        if missing:
            raise ValueError(f"corpus df missing columns: {missing}")
        if "metadata" not in df.columns:
            df = df.withColumn(
                "metadata", F.create_map().cast("map<string,string>")
            )
        self.df = df.select("id", "content", "metadata")

    # -- loaders ------------------------------------------------------------

    @classmethod
    def from_documents(cls, spark: SparkSession, units: list[Unit]) -> "Corpus":
        rows = [(u.id, u.content, u.metadata) for u in units]
        return cls(spark.createDataFrame(rows, SCHEMA))

    @classmethod
    def from_text(cls, spark: SparkSession, texts: list[str]) -> "Corpus":
        rows = [(str(i), t, {}) for i, t in enumerate(texts)]
        return cls(spark.createDataFrame(rows, SCHEMA))

    @classmethod
    def from_dataframe(
        cls, df: DataFrame, content_col: str, id_col: Optional[str] = None
    ) -> "Corpus":
        out = df.withColumn("content", F.col(content_col).cast("string"))
        if id_col is None:
            out = out.withColumn("id", F.monotonically_increasing_id().cast("string"))
        else:
            out = out.withColumn("id", F.col(id_col).cast("string"))
        meta_cols = [c for c in df.columns if c not in (content_col, id_col)]
        meta = F.map_from_arrays(
            F.array(*[F.lit(c) for c in meta_cols]),
            F.array(*[F.col(c).cast("string") for c in meta_cols]),
        ) if meta_cols else F.create_map().cast("map<string,string>")
        return cls(out.withColumn("metadata", meta))

    @classmethod
    def from_files(cls, spark: SparkSession, path: str, glob: Optional[str] = None) -> "Corpus":
        from lotus_spark.sources.connectors import load_files

        pages = load_files(spark, path, glob)
        return cls(
            pages.select(
                F.concat_ws("#", "file_path", "page_label").alias("id"),
                F.col("content"),
                F.map_from_arrays(
                    F.array(F.lit("file_path"), F.lit("page_label")),
                    F.array(F.col("file_path"), F.col("page_label")),
                ).alias("metadata"),
            )
        )

    # -- ops ----------------------------------------------------------------

    def shard(self, size: int) -> DataFrame:
        """Assign a shard id (≈``size`` units each) and co-locate shards."""
        rn = F.row_number().over(Window.orderBy("id")) - 1
        out = self.df.withColumn("_shard", F.floor(rn / size).cast("int"))
        return out.repartition(F.col("_shard"))

    def agent(self, task: str, **kwargs: Any):
        """Run an agentic op pipeline over this corpus (reference
        ``Corpus.agent``; see :func:`lotus_spark.agentic.run_pipeline` for
        the full signature — ops/tools/plan/completer_factory/...)."""
        from lotus_spark.agentic.pipeline import run_pipeline

        return run_pipeline(self, task, **kwargs)

    def count(self) -> int:
        return self.df.count()

    def units(self) -> list[Unit]:
        return [
            Unit(r["id"], r["content"], dict(r["metadata"] or {}))
            for r in self.df.collect()
        ]
