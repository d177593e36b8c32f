"""sem_search — top-K nearest-neighbor search of a query over a column.

Reference semantics (``lotus/sem_ops/sem_search.py:91-157``): embed the query,
retrieve top-K most-similar rows of the indexed column, post-filtered to the
current DataFrame (the reference doubles K until K survivors — free here
because we score the *current* rows directly); optional cross-encoder rerank
``n_rerank``; ``return_scores`` adds ``vec_scores_sim_score``.

Spark design: the query vector is a literal (broadcast by value); scoring is
JVM-side cosine (``lotus_spark.functions.vectors``) over an embedding column
— no Python in the scan — then ``orderBy(desc(score)).limit(K)``. With a
precomputed embedding column this is a single pruned-column scan + top-K; at
100 TB Spark's TakeOrderedAndProject keeps only K rows per partition.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotus_spark.operators.sem_index import EMB_COL, _resolve_rm, with_embeddings

SCORE_COL = "vec_scores_sim_score"


def sem_search(
    df: DataFrame,
    col: str,
    query: str,
    K: int = 10,
    rm: Any = None,
    return_scores: bool = False,
    n_rerank: Optional[int] = None,
    reranker: Any = None,
    emb_col: Optional[str] = None,
    tie_break: Optional[str] = None,
    query_vec: Optional[list] = None,
) -> DataFrame:
    """Top-K rows of ``df`` whose ``col`` embedding is most similar to ``query``.

    ``emb_col``: reuse an existing embedding column (indexed df); otherwise
    embeddings are computed on the fly with the RM.
    ``tie_break``: optional column for deterministic ordering on score ties.
    ``query_vec``: search by a precomputed query vector instead of embedding
    ``query`` with the RM (vector-database-style entry point; no RM needed
    when ``emb_col`` is also given).
    """
    if query_vec is not None:
        qvec = [float(x) for x in query_vec]
        model = None if emb_col is not None else _resolve_rm(rm)
    else:
        model = _resolve_rm(rm)
        qvec = [float(x) for x in model([query])[0]]

    scored = df
    ecol = emb_col
    if ecol is None:
        scored = with_embeddings(scored, col, model, EMB_COL)
        ecol = EMB_COL
    from lotus_spark.functions.vectors import query_cosine

    scored = scored.withColumn(SCORE_COL, query_cosine(F.col(ecol), qvec))

    order = [F.desc(SCORE_COL)]
    if tie_break is not None:
        order.append(F.asc(tie_break))
    out = scored.orderBy(*order).limit(K)

    if n_rerank is not None and reranker is not None:
        out = _rerank(out, col, query, n_rerank, reranker)
    if emb_col is None:
        out = out.drop(EMB_COL)
    if not return_scores:
        out = out.drop(SCORE_COL)
    return out


def _rerank(df: DataFrame, col: str, query: str, n: int, reranker: Any) -> DataFrame:
    """Cross-encoder rerank of the (small, ≤K) candidate set."""
    pdf = df.toPandas()
    docs = pdf[col].astype(str).tolist()
    idx = reranker(query, docs, n)
    spark = df.sparkSession
    return spark.createDataFrame(pdf.iloc[list(idx)], schema=df.schema)
