"""Deterministic Lloyd's KMeans over integer-quantized embeddings.

Reference parity target: ``lotus/sem_ops/sem_cluster_by.py:57-86`` /
``lotus/utils.py:14-72`` run FAISS ``Kmeans`` — float arithmetic whose
result depends on reduction order, so it can never hash-match a SQL oracle.
This module is the *reproducible tier*: the same Lloyd's structure
(init → assign → mean-update × ``iters``) but with every step in
order-independent integer arithmetic, so any aggregation topology — Spark
partial aggregates, DuckDB single-node, a 1000-executor shuffle tree —
produces bit-identical assignments:

- **Quantize** each embedding value once: ``xq = floor((x + shift) * quant)``
  as BIGINT (shift makes the domain non-negative so floor == truncation and
  integer division below is unambiguous).
- **Init**: the k rows with the smallest ``(a*id + b) mod M`` (seeded affine
  hash; ties by id) are the initial centroids — SQL-expressible, no RNG.
- **Assign**: ``argmin_c Σ_j (xq_j - C_cj)²`` — integer distances (≤ ~2^50
  for 64 dims at quant 2^20: exact in int64 *and* float64), ties to the
  smaller cluster id.
- **Update**: per-dim BIGINT sums (order-independent) + counts; new centroid
  ``C_cj = (2·S_cj + n_c) div (2·n_c)`` (round-half-up integer division).
  Empty clusters keep their previous centroid.

The per-iteration aggregation runs as ONE wide ``groupBy(c)`` with d per-dim
``sum`` columns (r14: replaced the posexplode → groupBy(c, dim) →
groupBy(c) two-exchange shape): map-side partial aggregation reduces the
shuffle to k×(d+1) longs per partition through a single exchange, and only
k×d totals ever reach the driver — scales to arbitrary row counts.

The matching unrolled SQL oracle is generated in ``__spark_entry__.py``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotus_spark.functions.text import MOD
from lotus_spark.partitioning import ensure_parallelism

QUANT = 1 << 20
SHIFT = 2.0


def kmeans_init_params(seed: int) -> tuple[int, int]:
    """Seeded affine-hash params for the init ordering (same family as the
    minhash signature hashes)."""
    a = (2_654_435_761 * (seed + 1) + 1) % MOD
    b = (40_503 * (seed + 1) + 7) % MOD
    return a, b


def quantize_embedding(emb):  # Column -> array<bigint>
    """``floor((x + SHIFT) * QUANT)`` per element — the same float64 op
    order DuckDB's ``CAST(floor((x + 2.0) * 1048576.0) AS BIGINT)`` runs."""
    return F.transform(
        emb.cast("array<double>"),
        lambda x: F.floor((x + F.lit(SHIFT)) * F.lit(float(QUANT))).cast("long"),
    )


def train_sample_predicate(id_col: str, seed: int, threshold: int):
    """Deterministic training-sample membership: ``(a*id + b) % MOD <
    threshold`` with the seeded affine-hash family — a pure map-side
    predicate (no shuffle, no count, independent of partitioning), and
    SQL-expressible so an oracle replays the exact same sample
    (:func:`train_sample_where`). ``threshold/MOD`` is the sampled
    fraction. This is how FAISS-style quantizer training bounds its
    input: codebooks/centroids learn from a pinned hash-selected subset
    while assignment/encoding still maps over every row."""
    a, b = kmeans_init_params(seed)
    # id reduced mod MOD BEFORE the multiply: a*id would overflow int64
    # (an ANSI-mode ArithmeticException) for generated ids like
    # monotonically_increasing_id's partition<<33 values; for natural ids
    # < MOD (every testdata table) the reduction is the identity, so the
    # SQL oracles' plain (a*id + b) % MOD replays unchanged
    idm = F.pmod(F.col(id_col), F.lit(MOD))
    return ((F.lit(a) * idm + F.lit(b)) % F.lit(MOD)) < F.lit(int(threshold))


def train_sample_where(id_col: str, seed: int, threshold: int) -> str:
    """SQL twin of :func:`train_sample_predicate` (same affine hash,
    same comparison) for oracle replicas."""
    a, b = kmeans_init_params(seed)
    return f"(({a} * {id_col} + {b}) % {MOD}) < {int(threshold)}"


def _update_centroids(sums: list[tuple], prev: np.ndarray, k: int) -> np.ndarray:
    """New centroids from collected (c, n, [S_j]) rows; round-half-up
    integer division; clusters with no points keep their previous centroid."""
    cent = prev.copy()
    for c, n, svec in sums:
        s = np.asarray(svec, dtype=np.int64)
        cent[c] = (2 * s + n) // (2 * n)
    return cent


def deterministic_kmeans(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    k: int,
    iters: int = 3,
    seed: int = 42,
    cluster_col: str = "cluster_id",
    train_filter=None,
) -> tuple[DataFrame, np.ndarray]:
    """Returns (input df + ``cluster_col``, final centroids [k, d] int64).

    Driver state is k×d integers per iteration; everything row-scaled stays
    distributed (quantize/assign are map-only; the update is one partially-
    aggregated groupBy per iteration).

    ``train_filter`` (a boolean Column, e.g.
    :func:`train_sample_predicate`) bounds the TRAINING input: init and
    the per-iteration update aggregates see only the filtered rows,
    while the returned assignment still covers every row of ``df``. At
    100 TB this is the difference between ``iters`` full-table aggregate
    passes per quantizer and ``iters`` passes over a ≤1M-row pinned
    sample — centroid quality needs a representative sample, not the
    corpus (FAISS trains coarse/PQ codebooks the same way); only the
    map-only assignment must touch all rows.
    """
    a, b = kmeans_init_params(seed)
    q = df.withColumn("__xq", quantize_embedding(F.col(emb_col)))
    # NULL embeddings cannot train (they assign NULL at the end); an
    # unlucky init hash must never promote one to a centroid
    q = q.filter(F.col("__xq").isNotNull())
    if train_filter is not None:
        q = q.filter(train_filter)
    q = ensure_parallelism(q)
    q.persist()
    try:
        init_rows = (
            q.select(id_col, "__xq")
            # pmod-reduce the id first: identity for ids < MOD (every
            # oracle table), int64-overflow-safe for generated ids
            # (monotonically_increasing_id under ANSI mode)
            .withColumn(
                "__h",
                (F.lit(a) * F.pmod(F.col(id_col), F.lit(MOD)) + F.lit(b))
                % F.lit(MOD),
            )
            .orderBy("__h", id_col)
            .limit(k)
            .collect()
        )
        if len(init_rows) < k:
            raise ValueError(
                f"deterministic_kmeans: training input has only "
                f"{len(init_rows)} rows for k={k} centroids"
                + (" — widen train_filter" if train_filter is not None
                   else "")
            )
        cent = np.asarray([r["__xq"] for r in init_rows], dtype=np.int64)
        d = cent.shape[1]

        def assign_expr(centroids: np.ndarray):
            # single source for the assignment arithmetic (the SQL
            # oracles replay it; two hand-synced copies invited drift)
            return quantized_assign_expr(centroids)(F.col("__xq"))

        for _ in range(iters):
            # ONE wide aggregate per iteration (r14 optimization, guide
            # §2.3/§2.4): d per-dim BIGINT sums + the row count, grouped
            # by cluster — map-side partial aggregation ships k×(d+1)
            # longs per partition through a SINGLE exchange, replacing
            # the posexplode (d× the rows) → groupBy(c, dim) →
            # groupBy(c) two-exchange shape. Integer sums are
            # order-independent, so the collected totals (and every
            # centroid derived from them) are bit-identical.
            assigned = q.withColumn("__c", assign_expr(cent))
            sums = (
                assigned.groupBy("__c")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.sum(F.col("__xq")[j]).alias(f"s{j}")
                      for j in range(d)],
                )
                .collect()
            )
            rows = [
                (r["__c"], r["n"], [r[f"s{j}"] for j in range(d)])
                for r in sums
            ]
            cent = _update_centroids(rows, cent, k)

        out = df.withColumn("__xq", quantize_embedding(F.col(emb_col)))
        out = out.withColumn(cluster_col, assign_expr(cent)).drop("__xq")
        return out, cent
    finally:
        q.unpersist()


def quantize_vector(vec, shift: float = SHIFT, quant: int = QUANT) -> list[int]:
    """Driver-side quantization of a plain query vector (same op order)."""
    import math

    return [int(math.floor((float(x) + shift) * float(quant))) for x in vec]


def quantized_assign_expr(centroids: np.ndarray):
    """Column factory: nearest-centroid id (exact int64 L2, ties to the
    lowest centroid index) for a quantized subvector column. The same
    arithmetic ``deterministic_kmeans`` assigns with, exposed for
    map-only encode passes that train elsewhere."""
    C = np.asarray(centroids, dtype=np.int64).copy()

    @F.pandas_udf("int")
    def _assign(xq_s):
        import pandas as pd

        # NULL embeddings assign NULL (quantize_embedding of NULL is
        # NULL): tolerate instead of crashing the whole Arrow batch
        valid = xq_s.notna().to_numpy()
        out = np.full(len(xq_s), None, dtype=object)
        if valid.any():
            X = np.stack(xq_s[valid].to_numpy()).astype(np.int64)
            # [n, k, d] diffs are int64-exact (<= ~2^50 per distance)
            dists = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            out[valid] = np.argmin(dists, axis=1).astype(np.int32)
        return pd.Series(out, dtype=object)

    return _assign


def pq_train_codebooks(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    m: int,
    sub: int,
    k: int,
    iters: int = 3,
    seed: int = 42,
    train_filter=None,
) -> np.ndarray:
    """Train ALL ``m`` PQ subspace codebooks in ONE grouped Lloyd's loop
    — value-identical to ``m`` independent ``deterministic_kmeans`` runs
    (seed offset ``seed + s`` per subspace, same init hash order, same
    integer assignment/update arithmetic; pinned by
    ``test_pq_grouped_training_matches_per_subspace``), but the training
    sample is scanned ``iters + 1`` times TOTAL instead of
    ``m * (iters + 1)``: the (subspace, subvector) pairs explode into
    one relation and every init/update job covers all subspaces at
    once. At 100 TB this removes the m× factor from the only part of
    the PQ build that scans data repeatedly; on small data it removes
    ~m× the per-job scheduling overhead (measured 8x fewer Spark jobs
    for m=8). Returns centroids [m, k, sub] int64.
    """
    from pyspark.sql import Window

    q = df.withColumn("__xq", quantize_embedding(F.col(emb_col)))
    q = q.filter(F.col("__xq").isNotNull())  # NULLs cannot train
    if train_filter is not None:
        q = q.filter(train_filter)
    q = ensure_parallelism(q)
    subs = F.array(*[
        F.struct(F.lit(s).alias("s"),
                 F.slice("__xq", s * sub + 1, sub).alias("v"))
        for s in range(m)
    ])
    ex = (
        q.select(id_col, F.explode(subs).alias("__e"))
        .select(id_col, F.col("__e.s").alias("__s"),
                F.col("__e.v").alias("__v"))
    )
    ex.persist()
    try:
        # per-subspace init hash params as literal lookup arrays: the
        # k smallest (h, id) rows per subspace are exactly what each
        # independent run's orderBy(h, id).limit(k) selects
        ab = [kmeans_init_params(seed + s) for s in range(m)]
        a_arr = F.array(*[F.lit(a) for a, _ in ab])
        b_arr = F.array(*[F.lit(b) for _, b in ab])
        h = (
            F.element_at(a_arr, F.col("__s") + 1)
            * F.pmod(F.col(id_col), F.lit(MOD))
            + F.element_at(b_arr, F.col("__s") + 1)
        ) % F.lit(MOD)
        w = Window.partitionBy("__s").orderBy("__h", id_col)
        init_rows = (
            ex.withColumn("__h", h)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("__s", "__rn", "__v")
            .collect()
        )
        counts = [0] * m
        cents = np.zeros((m, k, sub), dtype=np.int64)
        for r in init_rows:
            cents[r["__s"], r["__rn"] - 1] = r["__v"]
            counts[r["__s"]] += 1
        if any(c < k for c in counts):
            raise ValueError(
                f"pq_train_codebooks: training input has only "
                f"{min(counts)} rows for k={k} centroids"
                + (" — widen train_filter" if train_filter is not None
                   else "")
            )

        def grouped_assign(C: np.ndarray):
            Cc = C.copy()

            @F.pandas_udf("int")
            def _assign(s_s, v_s):
                import pandas as pd

                S = s_s.to_numpy().astype(np.int64)
                X = np.stack(v_s.to_numpy()).astype(np.int64)
                out = np.empty(len(S), dtype=np.int32)
                for s in np.unique(S):
                    mask = S == s
                    d = ((X[mask][:, None, :] - Cc[s][None, :, :]) ** 2
                         ).sum(axis=2)
                    out[mask] = np.argmin(d, axis=1).astype(np.int32)
                return pd.Series(out)

            return _assign(F.col("__s"), F.col("__v"))

        for _ in range(iters):
            # same single-exchange wide aggregate as deterministic_kmeans
            # (r14): sub per-dim sums + count grouped by (subspace,
            # cluster) — one shuffle of m×k×(sub+1) longs per partition
            # instead of posexplode + two exchanges. Integer sums are
            # order-independent; totals are bit-identical.
            assigned = ex.withColumn("__c", grouped_assign(cents))
            sums = (
                assigned.groupBy("__s", "__c")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.sum(F.col("__v")[j]).alias(f"s{j}")
                      for j in range(sub)],
                )
                .collect()
            )
            new = cents.copy()
            for s in range(m):
                rows = [
                    (r["__c"], r["n"], [r[f"s{j}"] for j in range(sub)])
                    for r in sums if r["__s"] == s
                ]
                new[s] = _update_centroids(rows, cents[s], k)
            cents = new
        return cents
    finally:
        ex.unpersist()
