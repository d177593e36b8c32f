"""Lexical (BM25) retrieval and lexical+vector hybrid search.

The reference's retrieval surface is embedding-only (`sem_search`,
`lotus/sem_ops/sem_search.py:91-157`); production retrieval stacks pair
that with a lexical tier and fuse the two — this module adds both as
native DataFrame plans.

Scale shape: ``bm25_index`` is one scan + one explode/groupBy producing
the three classic relations (postings, doc lengths, document
frequencies) — persist them as Parquet and the per-query cost is a
semi-join of the postings against a handful of query terms (broadcast
hash join on term), never a full-corpus scan. Scoring is pure JVM
expression code (no UDFs).

Float-parity note (DuckDB oracle): per-(doc, term) partial scores are
rounded to 9 decimals and summed as DECIMAL — decimal addition is
order-independent, so the doc score is bit-identical no matter how Spark
partitions the aggregation. Summing raw doubles would tie the result to
aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

RRF_K = 60  # standard reciprocal-rank-fusion constant


def bm25_index(df: DataFrame, col: str, id_col: str) -> dict[str, DataFrame]:
    """Build the BM25 statistics relations for ``df[col]``.

    Returns ``postings`` (term, id, tf), ``doclens`` (id, dl) and
    ``termdf`` (term, df) — persist all three for a serving index.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(col))).alias("term"),
    ).filter(F.col("term") != "")
    postings = toks.groupBy("term", "id").agg(F.count("*").alias("tf"))
    doclens = toks.groupBy("id").agg(F.count("*").alias("dl"))
    termdf = postings.groupBy("term").agg(F.count("*").alias("df"))
    return {"postings": postings, "doclens": doclens, "termdf": termdf}


def bm25_scores(
    index: dict[str, DataFrame],
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document matching ≥1 query term: ``(id, score)``.

    Okapi BM25 with the standard +1-smoothed idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Duplicate query terms count
    once (set semantics, the common engine behavior).
    """
    postings, doclens, termdf = (
        index["postings"], index["doclens"], index["termdf"])
    terms = sorted(set(t for t in query_terms if t))
    if not terms:
        raise ValueError("empty query")
    spark = postings.sparkSession
    qdf = F.broadcast(spark.createDataFrame([(t,) for t in terms], ["term"]))

    # N and avgdl are two scalars — computed once, folded in as literals
    g = doclens.agg(
        F.count("*").alias("n"),
        F.sum("dl").cast("double").alias("s")).first()
    n_docs, avgdl = g["n"], (g["s"] or 0.0) / max(g["n"], 1)

    hits = (
        postings.join(qdf, "term")          # broadcast semi-join on term
        .join(termdf, "term")
        .join(doclens, "id")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    partial = (
        idf * (F.col("tf") * (1.0 + k1))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    # round→decimal before the sum: order-independent accumulation
    return (
        hits.withColumn("p", F.round(partial, 9).cast("decimal(28,10)"))
        .groupBy("id").agg(F.sum("p").cast("double").alias("score"))
    )


def bm25_search(
    df: DataFrame,
    col: str,
    id_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` lexical search over ``df[col]``; ties break on id."""
    idx = bm25_index(df, col, id_col)
    terms = [t for t in query.strip().lower().split() if t]
    scored = bm25_scores(idx, terms, k1=k1, b=b)
    return (
        scored.orderBy(F.desc("score"), F.asc("id")).limit(k)
        .withColumnRenamed("id", id_col)
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str,
    k: int = 10,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists (each ``(id_col, score)``,
    higher better): fused = Σ 1/(rrf_k + rank). Documents absent from a
    list contribute nothing for it. Rank fusion avoids calibrating
    incomparable score scales (BM25 vs cosine)."""
    from pyspark.sql import Window

    fused = None
    for i, r in enumerate(ranked):
        w = Window.orderBy(F.desc("score"), F.asc(id_col))
        ranks = r.select(
            id_col, F.row_number().over(w).alias(f"__r{i}"))
        fused = ranks if fused is None else fused.join(
            ranks, id_col, "full_outer")
    contribs = [
        F.when(F.col(f"__r{i}").isNotNull(),
               F.lit(1.0) / (F.lit(rrf_k) + F.col(f"__r{i}")))
        .otherwise(F.lit(0.0))
        for i in range(len(ranked))
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return (
        fused.select(id_col, total.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)
    )
