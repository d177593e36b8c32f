"""sem_index / load_sem_index — embed a column and persist the vectors.

Reference semantics (``lotus/sem_ops/sem_index.py:61-77``): embed a column
with the configured RM, persist vectors under ``index_dir``, and record the
pointer (the reference uses ``df.attrs["index_dirs"]``; we use the
``SemanticSession`` index catalog). ``load_sem_index``
(``load_sem_index.py:49-51``) attaches an existing index.

Spark design: the "index" is an embeddings DataFrame persisted as Parquet —
``(value, embedding)`` keyed by the column value (plus optional id). On a
cluster this is a distributed write; per-executor ANN sidecars (FAISS) are an
optional speed layer, with exact cosine as the correctness tier.
"""

from __future__ import annotations

from typing import Any, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from lotus_spark.session import IndexEntry, SemanticSession, settings

EMB_COL = "_lotus_emb"


def _resolve_rm(rm: Any):
    model = rm if rm is not None else settings.rm
    if model is None:
        raise ValueError("no RM configured: pass rm= or set lotus_spark.settings.rm")
    return model


def embed_udf(rm: Any):
    """Arrow-batched embedding UDF; the RM client is lazily initialized per
    executor (RM objects pickle as config only)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        vecs = rm([("" if v is None else str(v)) for v in s])
        return pd.Series([list(map(float, v)) for v in vecs], index=s.index)

    return _embed


def with_embeddings(
    df: DataFrame, col: str, rm: Any = None, out_col: str = EMB_COL
) -> DataFrame:
    """Append an embedding column for ``col`` (no persistence)."""
    model = _resolve_rm(rm)
    return df.withColumn(out_col, embed_udf(model)(F.col(f"`{col}`")))


def sem_index(
    df: DataFrame,
    col: str,
    index_dir: str,
    rm: Any = None,
    session: Optional[SemanticSession] = None,
) -> DataFrame:
    """Embed ``col``, persist ``(value, embedding)`` parquet at ``index_dir``,
    register in the session catalog. Returns the input df (index is a side
    artifact, as in the reference)."""
    emb = (
        with_embeddings(df.select(F.col(f"`{col}`")).distinct(), col, rm)
        .withColumnRenamed(col, "value")
    )
    emb.write.mode("overwrite").parquet(index_dir)
    if session is not None:
        session.register_index(col, IndexEntry(column=col, path=index_dir))
    return df


def load_sem_index(
    df: DataFrame,
    col: str,
    index_dir: str,
    session: Optional[SemanticSession] = None,
) -> DataFrame:
    """Attach an existing index dir to a column (metadata only)."""
    if session is not None:
        session.register_index(col, IndexEntry(column=col, path=index_dir))
    return df


def read_index(spark, index_dir: str) -> DataFrame:
    return spark.read.parquet(index_dir)
