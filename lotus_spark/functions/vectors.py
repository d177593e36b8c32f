"""Vector math: sequential-fold column expressions + vectorized pandas UDFs.

All arithmetic is done in double with an explicit sequential left fold over
dimensions, which makes results bit-exact reproducible (and matchable by a
DuckDB ``list_reduce`` oracle).

Two value-identical implementations:

- ``dot`` / ``l2_norm`` / ``cosine_sim`` — ``zip_with``/``aggregate``
  column expressions. Zero-dependency and fine for small inputs, BUT
  Catalyst higher-order functions are *interpreted* (excluded from
  whole-stage codegen), and their shared evaluator call sites degrade
  badly (up to ~10x) in long-lived sessions that have run many distinct
  lambda shapes. Keep these for oracle documentation and tiny inputs.
- ``query_cosine`` / ``pair_cosine`` — Arrow-batched pandas UDFs that
  accumulate dimension-by-dimension in numpy, reproducing the fold's op
  order bit-for-bit while doing the per-row work in C. These are the hot
  paths for knn / sim-join / dedup scoring: at 100 TB the Arrow transfer
  of the embedding column is the cost floor either way, and the numpy
  loop beats interpreted expression eval by an order of magnitude.

Replaces the reference's FAISS inner-product scoring
(``lotus/vector_store/faiss_vs.py:14``) for the exact-correctness tier.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


_UDF_CACHE: dict = {}


def _session_udf(name: str, factory):
    """Build a parameter-free pandas UDF ONCE per (name, SparkSession)
    and reuse the wrapped object: each ``@F.pandas_udf`` call pays
    ~25ms of py4j registration/pickling (r14, measured), and the rerank
    joins construct their scoring column on every query. Keyed on the
    active session so a restarted session gets a fresh JVM binding; at
    most a handful of entries per process."""
    from pyspark.sql import SparkSession

    key = (name, id(SparkSession.getActiveSession()))
    udf = _UDF_CACHE.get(key)
    if udf is None:
        udf = _UDF_CACHE[key] = factory()
    return udf


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


def _fold_dot_norm(V, np):
    """(dot-vs-self accumulator, per-row) via dim-ordered accumulate —
    identical op order to the sequential fold."""
    n, d = V.shape
    acc = np.zeros(n)
    for j in range(d):
        acc = acc + V[:, j] * V[:, j]
    return acc


def query_cosine(emb: Column, query_vec: Sequence[float]) -> Column:
    """``cosine_sim(emb, lit(query_vec))`` as a vectorized pandas UDF —
    value-identical (dim-ordered accumulation, same zero-norm rule)."""
    q = [float(v) for v in query_vec]
    nq_acc = 0.0
    for v in q:
        nq_acc = nq_acc + v * v
    nq = math.sqrt(nq_acc)
    qa = np.asarray(q, dtype=np.float64)

    @F.pandas_udf("double")
    def _udf(embs: pd.Series) -> pd.Series:
        valid = embs.notna().to_numpy()
        out = np.full(len(embs), np.nan)
        if valid.any():
            V = np.stack(embs[valid].to_numpy()).astype(np.float64)
            accd = np.zeros(V.shape[0])
            for j in range(V.shape[1]):
                accd = accd + V[:, j] * qa[j]
            na = np.sqrt(_fold_dot_norm(V, np))
            out[valid] = np.where(
                (na == 0.0) | (nq == 0.0), 0.0, accd / (na * nq)
            )
        res = pd.Series(out)
        return res.where(pd.Series(valid), None)

    return _udf(emb.cast("array<double>"))


def unit_vector(a: Column) -> Column:
    """Row-normalized copy of an array column (zero vectors pass through
    unchanged), as a vectorized pandas UDF — value-identical to
    ``transform(a, x -> x / l2_norm(a))`` with the fold-order norm."""
    return _session_udf("unit_vector", _make_unit_vector_udf)(
        a.cast("array<double>"))


def _make_unit_vector_udf():
    @F.pandas_udf("array<double>")
    def _udf(sa: pd.Series) -> pd.Series:
        def norm_one(v):
            if v is None:
                return None
            V = np.asarray(v, dtype=np.float64)
            acc = 0.0
            for x in V:
                acc = acc + x * x
            n = math.sqrt(acc)
            return V if n == 0.0 else V / n

        valid = sa.notna()
        if valid.all() and len(sa) > 0:
            try:
                V = np.stack(sa.to_numpy()).astype(np.float64)
                acc = _fold_dot_norm(V, np)
                n = np.sqrt(acc)
                safe = np.where(n == 0.0, 1.0, n)
                U = V / safe[:, None]
                U[n == 0.0] = V[n == 0.0]
                return pd.Series(list(U))
            except ValueError:  # ragged rows — fall back to per-row
                pass
        return sa.map(norm_one)

    return _udf


def pair_dot(a: Column, b: Column) -> Column:
    """``dot(a, b)`` as a vectorized pandas UDF — value-identical
    (dim-ordered accumulation of products)."""
    def _make():
        @F.pandas_udf("double")
        def _udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
            valid = (sa.notna() & sb.notna()).to_numpy()
            out = np.full(len(sa), np.nan)
            if valid.any():
                A = np.stack(sa[valid].to_numpy()).astype(np.float64)
                B = np.stack(sb[valid].to_numpy()).astype(np.float64)
                accd = np.zeros(A.shape[0])
                for j in range(A.shape[1]):
                    accd = accd + A[:, j] * B[:, j]
                out[valid] = accd
            res = pd.Series(out)
            return res.where(pd.Series(valid), None)

        return _udf

    return _session_udf("pair_dot", _make)(
        a.cast("array<double>"), b.cast("array<double>"))


def pair_cosine(a: Column, b: Column) -> Column:
    """``cosine_sim(a, b)`` as a vectorized pandas UDF — value-identical."""
    def _make():
        @F.pandas_udf("double")
        def _udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
            valid = (sa.notna() & sb.notna()).to_numpy()
            out = np.full(len(sa), np.nan)
            if valid.any():
                A = np.stack(sa[valid].to_numpy()).astype(np.float64)
                B = np.stack(sb[valid].to_numpy()).astype(np.float64)
                n = A.shape[0]
                accd = np.zeros(n)
                for j in range(A.shape[1]):
                    accd = accd + A[:, j] * B[:, j]
                na = np.sqrt(_fold_dot_norm(A, np))
                nb = np.sqrt(_fold_dot_norm(B, np))
                out[valid] = np.where(
                    (na == 0.0) | (nb == 0.0), 0.0, accd / (na * nb))
            res = pd.Series(out)
            return res.where(pd.Series(valid), None)

        return _udf

    return _session_udf("pair_cosine", _make)(
        a.cast("array<double>"), b.cast("array<double>"))
