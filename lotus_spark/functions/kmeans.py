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

The per-iteration aggregation is ONE fused ``mapInPandas`` pass (r14, 2nd
cut): each task assigns its rows and accumulates per-cluster integer
(count, per-dim sum) partials in numpy, emitting ≤k rows per partition;
the driver merges the ≤ partitions×k partials and derives the new
centroids. This replaced first the posexplode → two-exchange shape, then
the single-exchange wide ``groupBy(c).agg(sum×d)`` — the wide-agg shape
paid ~0.5s/iteration of driver-side py4j plan construction (d separate
``F.sum(col[j])`` chains) plus an exchange + second AQE stage job for a
k×(d+1)-long shuffle. Integer sums are associative/commutative, so the
merged totals (and every centroid derived from them) are bit-identical
to any aggregation topology. Training-sample partitions are bounded
(``_bound_train_partitions``), so the driver merge is ≤ cap×k rows —
a few MB at the 1M-row sample ceiling, independent of corpus size.

The matching unrolled SQL oracle is generated in ``__spark_entry__.py``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotus_spark.functions.text import MOD

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


#: Hard cap on training-sample partitions: bounds the per-iteration
#: driver merge to ``cap × k`` partial rows (a few MB for any realistic
#: k/d) no matter how many partitions the corpus scan arrived in.
TRAIN_MAX_PARTITIONS = 2048


def _bound_train_partitions(df: DataFrame) -> DataFrame:
    """Scale-adaptive partitioning for the pinned training sample
    (≤ ``max_train_rows`` rows by construction): boost a compacted
    single-file read up to cluster parallelism (the old
    ``ensure_parallelism`` behavior), and COALESCE a sample that
    inherited a 100-TB corpus's tens of thousands of scan partitions
    down to ``TRAIN_MAX_PARTITIONS`` — the sample is tiny, so task
    overhead and the per-partition partial rows the driver merges both
    stay bounded by the cap rather than by corpus partition count."""
    target = df.sparkSession.sparkContext.defaultParallelism
    cap = max(target, TRAIN_MAX_PARTITIONS)
    n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    if n > cap:
        return df.coalesce(cap)
    return df


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
    q = _bound_train_partitions(q)
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

        xq_only = q.select("__xq")
        for _ in range(iters):
            # ONE fused mapInPandas job per iteration (r14, guide
            # §1.2/§2.4/§4.2): each task assigns its rows against the
            # broadcast-by-closure centroids AND accumulates per-cluster
            # integer (count, per-dim sum) partials in numpy — no
            # exchange, no d-column aggregate expression tree, one
            # single-stage job. The driver merges ≤ partitions×k partial
            # rows (bounded by _bound_train_partitions). Integer sums
            # are order-independent, so the merged totals — and every
            # centroid derived from them — are bit-identical to the
            # former groupBy shape (and to the SQL oracle replica).
            rows = xq_only.mapInPandas(
                _plain_iter_partials(cent), "c int, n long, s array<bigint>"
            ).collect()
            cnt = np.zeros(k, dtype=np.int64)
            tot = np.zeros((k, d), dtype=np.int64)
            for r in rows:
                cnt[r["c"]] += r["n"]
                tot[r["c"]] += np.asarray(r["s"], dtype=np.int64)
            merged = [
                (int(c), int(cnt[c]), tot[c].tolist())
                for c in np.nonzero(cnt)[0]
            ]
            cent = _update_centroids(merged, cent, k)

        out = df.withColumn("__xq", quantize_embedding(F.col(emb_col)))
        out = out.withColumn(
            cluster_col, quantized_assign_expr(cent)(F.col("__xq"))
        ).drop("__xq")
        return out, cent
    finally:
        q.unpersist()


def _plain_iter_partials(centroids: np.ndarray):
    """mapInPandas factory for one ``deterministic_kmeans`` iteration:
    assign every ``__xq`` row to its nearest centroid (same int64
    arithmetic and argmin tie order as :func:`quantized_assign_expr`)
    and emit ≤k per-partition partial rows ``(c, n, s)`` — the
    per-cluster row count and per-dim BIGINT sums."""
    C = np.asarray(centroids, dtype=np.int64).copy()
    k, d = C.shape

    def part(batches):
        import pandas as pd

        n_acc = np.zeros(k, dtype=np.int64)
        s_acc = np.zeros((k, d), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            X = np.stack(pdf["__xq"].to_numpy()).astype(np.int64)
            # [n, k, d] diffs are int64-exact (<= ~2^50 per distance);
            # np.argmin ties to the smallest cluster id, matching
            # quantized_assign_expr
            dists = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            c = np.argmin(dists, axis=1)
            n_acc += np.bincount(c, minlength=k)
            np.add.at(s_acc, c, X)
        if seen:
            nz = np.nonzero(n_acc)[0]
            yield pd.DataFrame({
                "c": nz.astype(np.int32),
                "n": n_acc[nz],
                "s": [s_acc[i].tolist() for i in nz],
            })

    return part


def _pq_iter_partials(cents: np.ndarray):
    """mapInPandas factory for one grouped-PQ iteration over the
    ``(__s, __v)`` subspace explosion: per-subspace assignment (same
    arithmetic as the former grouped pandas UDF) + per-(subspace,
    cluster) integer partials, ≤ m×k rows per partition."""
    C = np.asarray(cents, dtype=np.int64).copy()
    m, k, sub = C.shape

    def part(batches):
        import pandas as pd

        n_acc = np.zeros((m, k), dtype=np.int64)
        s_acc = np.zeros((m, k, sub), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            S = pdf["__s"].to_numpy().astype(np.int64)
            X = np.stack(pdf["__v"].to_numpy()).astype(np.int64)
            for s in np.unique(S):
                mask = S == s
                Xs = X[mask]
                dists = ((Xs[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
                c = np.argmin(dists, axis=1)
                n_acc[s] += np.bincount(c, minlength=k)
                np.add.at(s_acc[s], c, Xs)
        if seen:
            ss, cs = np.nonzero(n_acc)
            yield pd.DataFrame({
                "s": ss.astype(np.int32),
                "c": cs.astype(np.int32),
                "n": n_acc[ss, cs],
                "v": [s_acc[s, c].tolist() for s, c in zip(ss, cs)],
            })

    return part


def _pq_init_topk(m: int, k: int):
    """mapInPandas factory for the grouped-PQ init: per partition, the
    k smallest ``(h, id)`` rows of each subspace (any row outside a
    partition's per-subspace top-k cannot be in the global top-k, so
    the driver merge below is an EXACT replay of the former
    ``row_number() over (partition by s order by h, id) <= k``
    window — without its exchange + sort)."""

    def part(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf[["__s", "__h", "__id", "__v"]]
            acc = pdf if acc is None else pd.concat((acc, pdf))
            # keep the running accumulator bounded at m×k rows
            acc = (acc.sort_values(["__s", "__h", "__id"], kind="mergesort")
                      .groupby("__s", sort=False).head(k))
        if acc is not None:
            yield acc

    return part


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


def pq_codes_expr(cents) -> "F.Column":
    """All-m-subspace PQ encode in ONE pandas UDF (r14): replaces the m
    per-subspace ``quantized_assign_expr`` columns over ``F.slice``
    views — one Arrow column in, one plan node, one boundary crossing
    instead of m. Value-identical: subspace s scores slice
    ``[s*sub, (s+1)*sub)`` against codebook s with the same int64
    arithmetic and argmin tie order. NULL quantized embeddings encode
    as an array of m NULL codes — exactly what ``F.array`` of m NULL
    per-subspace assignments produced."""
    C = np.asarray(cents, dtype=np.int64).copy()  # [m, k, sub]
    m, _, sub = C.shape

    @F.pandas_udf("array<int>")
    def _enc(xq_s):
        import pandas as pd

        valid = xq_s.notna().to_numpy()
        out = np.full(len(xq_s), None, dtype=object)
        if valid.any():
            X = np.stack(xq_s[valid].to_numpy()).astype(np.int64)
            Xs = X.reshape(len(X), m, sub)
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                d = ((Xs[:, s, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d, axis=1)
            for pos, c in zip(np.nonzero(valid)[0], codes):
                out[pos] = c.tolist()
        for i in np.nonzero(~valid)[0]:
            out[i] = [None] * m
        return pd.Series(out, dtype=object)

    return _enc


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
    q = df.withColumn("__xq", quantize_embedding(F.col(emb_col)))
    q = q.filter(F.col("__xq").isNotNull())  # NULLs cannot train
    if train_filter is not None:
        q = q.filter(train_filter)
    q = _bound_train_partitions(q)
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
        # init: per-partition per-subspace top-k in one fused
        # mapInPandas job, exact-merged on the driver — replaces the
        # row_number window (exchange + full sort) with a single-stage
        # job whose collected rows are bounded at partitions×m×k
        init_rows = (
            ex.withColumn("__h", h)
            .select("__s", "__h",
                    F.col(id_col).cast("long").alias("__id"), "__v")
            .mapInPandas(
                _pq_init_topk(m, k),
                "__s int, __h bigint, __id bigint, __v array<bigint>")
            .collect()
        )
        per_s: dict[int, list] = {s: [] for s in range(m)}
        for r in init_rows:
            per_s[r["__s"]].append((r["__h"], r["__id"], r["__v"]))
        counts = [0] * m
        cents = np.zeros((m, k, sub), dtype=np.int64)
        for s in range(m):
            # the global k smallest (h, id) per subspace — exactly the
            # rows the former window's rn <= k selected, in rn order
            for i, (_, _, v) in enumerate(sorted(per_s[s])[:k]):
                cents[s, i] = v
                counts[s] += 1
        if any(c < k for c in counts):
            raise ValueError(
                f"pq_train_codebooks: training input has only "
                f"{min(counts)} rows for k={k} centroids"
                + (" — widen train_filter" if train_filter is not None
                   else "")
            )

        sv_only = ex.select("__s", "__v")
        for _ in range(iters):
            # ONE fused mapInPandas job per iteration (r14, same shape
            # as deterministic_kmeans): per-subspace assignment + the
            # per-(subspace, cluster) integer partials accumulate in
            # the task, the driver merges ≤ partitions×m×k rows.
            # Integer sums are order-independent; totals (and the
            # centroids derived) are bit-identical to the former
            # grouped wide aggregate.
            rows = sv_only.mapInPandas(
                _pq_iter_partials(cents),
                "s int, c int, n long, v array<bigint>",
            ).collect()
            n_acc = np.zeros((m, k), dtype=np.int64)
            t_acc = np.zeros((m, k, sub), dtype=np.int64)
            for r in rows:
                n_acc[r["s"], r["c"]] += r["n"]
                t_acc[r["s"], r["c"]] += np.asarray(r["v"], dtype=np.int64)
            new = cents.copy()
            for s in range(m):
                merged = [
                    (int(c), int(n_acc[s, c]), t_acc[s, c].tolist())
                    for c in np.nonzero(n_acc[s])[0]
                ]
                new[s] = _update_centroids(merged, cents[s], k)
            cents = new
        return cents
    finally:
        ex.unpersist()
