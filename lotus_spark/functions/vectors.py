"""Vector math as native Spark SQL higher-order functions (JVM-side).

No Python UDFs here: ``zip_with``/``aggregate``/``transform`` run inside
whole-stage codegen, so cosine similarity over 100 TB of ``array<float>``
columns never crosses the JVM↔Python boundary. All arithmetic is done in
double with an explicit sequential left fold, which makes results bit-exact
reproducible (and matchable by a DuckDB ``list_reduce`` oracle).

Replaces the reference's FAISS inner-product scoring
(``lotus/vector_store/faiss_vs.py:14``) for the exact-correctness tier.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array columns (double)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )
