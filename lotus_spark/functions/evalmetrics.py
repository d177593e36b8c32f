"""Retrieval quality metrics (nDCG@k) — the measurement half of the
reference's paper-regression benchmarks
(``/root/reference/benchmarks/reranking/test_paper_results.py:228-238``
asserts SciFact nDCG@10 > 0.6 for its rerankers; computing the metric is
public BEIR/TREC methodology).

Two tiers:

- :func:`ndcg_at_k` — pure-Python single-query helper (tests, driver-side
  spot checks).
- :func:`ndcg_at_k_df` — distributed DataFrame version: one shuffle on the
  query id, rows bounded to k per query before any aggregation, so
  evaluating a million-query sweep against a qrels relation is a normal
  Spark join + window job, never a driver loop.

Gain is the graded-relevance standard ``2^rel - 1`` with ``log2(rank+1)``
discount (TREC / BEIR convention).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ndcg_at_k(ranked_ids: list, rels: dict, k: int = 10) -> float:
    """nDCG@k for one query: ``ranked_ids`` in retrieval order,
    ``rels`` mapping doc id -> graded relevance (missing = 0)."""
    dcg = sum(
        (2 ** rels.get(d, 0) - 1) / math.log2(i + 2)
        for i, d in enumerate(ranked_ids[:k])
    )
    ideal = sorted((r for r in rels.values() if r > 0), reverse=True)[:k]
    idcg = sum((2 ** r - 1) / math.log2(i + 2) for i, r in enumerate(ideal))
    return dcg / idcg if idcg > 0 else 0.0


def ndcg_at_k_df(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rel_col: str = "rel",
    score_col: str = "score",
) -> DataFrame:
    """Per-query nDCG@k: ``results`` is (query_id, doc_id, score) —
    retrieval output, any number of rows per query; ``qrels`` is
    (query_id, doc_id, rel) graded judgments.

    Plan: rank results per query (window, rows cut to k immediately) →
    left join judgments (unjudged = 0, standard convention) → one hash
    aggregate for DCG; ideal DCG is the same shape over qrels alone.
    Both windows partition by the query id — at any corpus size the
    shuffled rows are bounded by (queries × k) + |qrels|.
    """
    w = Window.partitionBy(query_col).orderBy(F.desc(score_col), doc_col)
    ranked = (
        results.select(query_col, doc_col, score_col)
        .withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
    )
    judged = ranked.join(
        qrels.select(query_col, doc_col, rel_col), [query_col, doc_col], "left"
    ).withColumn(rel_col, F.coalesce(F.col(rel_col), F.lit(0)))
    gain = (F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - 1.0)
    disc = F.log2(F.col("__rank").cast("double") + 1.0)
    dcg = judged.groupBy(query_col).agg(F.sum(gain / disc).alias("__dcg"))

    iw = Window.partitionBy(query_col).orderBy(
        F.desc(rel_col), F.asc(doc_col)
    )
    ideal = (
        qrels.filter(F.col(rel_col) > 0)
        .withColumn("__rank", F.row_number().over(iw))
        .filter(F.col("__rank") <= k)
        .groupBy(query_col)
        .agg(F.sum(gain / disc).alias("__idcg"))
    )
    # right join from ideal: a query with no positive judgments has no
    # defined nDCG and is excluded (BEIR convention); a judged query the
    # retriever missed entirely scores 0
    return (
        ideal.join(dcg, query_col, "left")
        .select(
            query_col,
            (F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"))
            .alias("ndcg"),
        )
    )
