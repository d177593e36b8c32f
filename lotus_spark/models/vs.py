"""Vector-store layer (reference ``lotus/vector_store/vs.py:10-58``:
``index / load_index / __call__(query_vectors, K, ids) /
get_vectors_from_index`` with FAISS/Qdrant/Weaviate backends).

Spark restatement (SURVEY §2.4): the *correctness tier* is exact cosine in
DataFrame expressions (``functions.ann``); this module is the *speed tier* —
a ``BroadcastVectorIndex`` built from an embeddings DataFrame, shipped to
executors once, and probed inside ``mapInPandas`` with a vectorized numpy
matmul (or FAISS when installed). This replaces the reference's in-process
FAISS index: the index side must fit in executor memory (same constraint the
reference has on one machine), while the *query* side streams through at any
scale with zero shuffle.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


class BroadcastVectorIndex:
    """An id→vector index collected from a DataFrame and broadcast to tasks.

    ``search(queries, K)`` returns (ids, scores) by inner product over
    l2-normalized vectors (= cosine). Uses FAISS ``IndexFlatIP`` when
    importable, else a numpy matmul — identical results, both exact.
    Pickles the raw matrix; FAISS structures rebuild lazily per executor.
    """

    def __init__(self, ids: np.ndarray, matrix: np.ndarray,
                 normalize: bool = True):
        self.ids = ids
        mat = np.asarray(matrix, dtype=np.float32)
        if normalize:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            mat = mat / norms
        self.matrix = mat
        self._faiss = None
        self._faiss_tried = False

    @classmethod
    def build(cls, df: DataFrame, id_col: str, emb_col: str,
              normalize: bool = True) -> "BroadcastVectorIndex":
        pdf = df.select(id_col, emb_col).toPandas()
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf[emb_col].map(np.asarray).to_list()).astype(np.float32) \
            if len(pdf) else np.zeros((0, 0), dtype=np.float32)
        return cls(ids, mat, normalize=normalize)

    def __len__(self) -> int:
        return len(self.ids)

    def _faiss_index(self):
        if not self._faiss_tried:
            self._faiss_tried = True
            try:  # pragma: no cover - faiss not in this container
                import faiss  # type: ignore

                ix = faiss.IndexFlatIP(self.matrix.shape[1])
                ix.add(self.matrix)
                self._faiss = ix
            except ImportError:
                self._faiss = None
        return self._faiss

    def search(self, queries: np.ndarray, K: int,
               normalize: bool = True) -> tuple[np.ndarray, np.ndarray]:
        """(ids[nq, K], scores[nq, K]) — exact inner-product top-K."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if normalize:
            norms = np.linalg.norm(q, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            q = q / norms
        k = min(K, len(self.ids))
        if k == 0:
            return (np.zeros((len(q), 0), dtype=self.ids.dtype),
                    np.zeros((len(q), 0), dtype=np.float32))
        ix = self._faiss_index()
        if ix is not None:  # pragma: no cover
            scores, pos = ix.search(q, k)
            return self.ids[pos], scores
        sims = q @ self.matrix.T  # [nq, n]
        # argpartition then exact sort of the k head; ties broken by id asc
        part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        out_ids = np.empty((len(q), k), dtype=self.ids.dtype)
        out_scores = np.empty((len(q), k), dtype=np.float32)
        for r in range(len(q)):
            cand = part[r]
            order = sorted(cand, key=lambda c: (-sims[r, c], self.ids[c]))
            out_ids[r] = self.ids[order]
            out_scores[r] = sims[r, order]
        return out_ids, out_scores

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_faiss"] = None
        d["_faiss_tried"] = False
        return d


def ann_join(
    left: DataFrame,
    index: BroadcastVectorIndex,
    left_emb_col: str,
    K: int,
    id_out: str = "match_id",
    score_out: str = "_scores",
) -> DataFrame:
    """K-NN join of every left row against the broadcast index — zero
    shuffle: each task probes its Arrow batch with one matmul. Output is
    exploded to one row per (left row, neighbor), ranked best-first."""
    spark_ids_are_int = np.issubdtype(index.ids.dtype, np.integer)
    out_schema = StructType(
        left.schema.fields
        + [
            StructField(id_out, LongType() if spark_ids_are_int else
                        ArrayType(DoubleType()).elementType),
            StructField(score_out, DoubleType()),
            StructField("_rank", LongType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            q = np.stack(pdf[left_emb_col].map(np.asarray).to_list())
            ids, scores = index.search(q, K)
            k = ids.shape[1]
            rep = pdf.loc[pdf.index.repeat(k)].reset_index(drop=True)
            rep[id_out] = ids.reshape(-1)
            rep[score_out] = np.round(scores.reshape(-1).astype(np.float64), 6)
            rep["_rank"] = np.tile(np.arange(1, k + 1), len(pdf))
            yield rep

    return left.mapInPandas(run, schema=out_schema)


class BroadcastPQIndex:
    """PQ-COMPRESSED broadcast candidate index — the 64x-reach extension
    of :class:`BroadcastVectorIndex`. That index broadcasts the raw
    float32 matrix, so the right side must fit executor memory
    uncompressed (64-dim float32 = 256 B/row). This one broadcasts only
    the PQ codes (m codes/row, 1 B each at nbits<=8) plus the integer
    codebooks from ``functions.ann.pq_index`` — m=8 codes = 8 B/row,
    32x-64x smaller, so a right side of hundreds of millions of rows
    still ships to every task.

    ``search(queries, K)`` returns APPROXIMATE candidates by ADC
    (asymmetric distance: query quantized to the codebooks' integer
    domain, per-subspace L2 lookup tables, ascending distance, ties to
    the smaller id) — the same scoring ``knn_topk_pq`` runs JVM-side,
    here vectorized in numpy for many queries at once. Exact vectors
    are NOT in the broadcast; compose with a distributed exact rerank
    (:func:`ann_join_pq`) when true cosine order matters.
    """

    def __init__(self, ids: np.ndarray, codes: np.ndarray,
                 codebooks) -> None:
        self.ids = ids
        self.codebooks = np.asarray(codebooks, dtype=np.int64)  # [m,k,sub]
        # Codes are indices into the codebooks — store them at the
        # narrowest width that holds k_codes so the broadcast pickle is
        # actually ~1 B/code at nbits<=8 (int64 here would 8x the
        # driver + broadcast footprint at the auto-tier ceiling).
        k_codes = self.codebooks.shape[1] if self.codebooks.ndim == 3 else 256
        dt = (np.uint8 if k_codes <= 256
              else np.uint16 if k_codes <= 65536 else np.int64)
        self.codes = np.asarray(codes, dtype=dt)              # [n, m]

    @classmethod
    def build(cls, encoded_df: DataFrame, id_col: str, code_col: str,
              codebooks) -> "BroadcastPQIndex":
        # Arrow path: one zero-copy-ish transfer of (id, flat codes) —
        # no per-row Python list objects on the driver. NULL-embedding
        # rows carry NULL codes (quantized_assign_expr emits NULL for
        # NULL inputs); Arrow's to_numpy would silently turn those into
        # NaN floats that uint8-cast to garbage code 0 — a VALID
        # codebook index, so phantom rows would earn plausible ADC
        # distances and displace real candidates. Exclude them loudly
        # here, mirroring the other NULL-hardened paths.
        tbl = (
            encoded_df
            .filter(F.col(code_col).isNotNull())
            .filter(F.forall(F.col(code_col), lambda c: c.isNotNull()))
            .select(id_col, code_col)
            .toArrow()
        )
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        m = len(codebooks)
        if len(ids):
            lists = tbl.column(code_col).combine_chunks()
            flat = lists.flatten().to_numpy(zero_copy_only=False)
            has_nan = (np.issubdtype(flat.dtype, np.floating)
                       and bool(np.isnan(flat).any()))
            if lists.null_count or has_nan:
                raise ValueError(
                    "BroadcastPQIndex.build: NULL PQ codes survived the "
                    "pre-transfer filter — refuse to cast NaN to uint8"
                )
            codes = flat.reshape(len(ids), m)
        else:
            codes = np.zeros((0, m), np.int64)
        return cls(ids, codes, codebooks)

    def __len__(self) -> int:
        return len(self.ids)

    def search(self, queries: np.ndarray, K: int
               ) -> tuple[np.ndarray, np.ndarray]:
        """(ids[nq, K], adc_dists[nq, K]) — approximate integer squared
        distances, ascending; ties to the smaller id. Query chunks are
        sized so the [chunk, n] distance matrix stays ~400 MB."""
        from lotus_spark.functions.kmeans import QUANT, SHIFT

        q = np.asarray(queries, dtype=np.float64)
        if q.ndim == 1:
            q = q[None, :]
        n, m = self.codes.shape
        k = min(K, n)
        if k == 0:
            return (np.zeros((len(q), 0), dtype=self.ids.dtype),
                    np.zeros((len(q), 0), dtype=np.int64))
        sub = self.codebooks.shape[2]
        qq = np.floor((q + SHIFT) * float(QUANT)).astype(np.int64)
        out_ids = np.empty((len(q), k), dtype=self.ids.dtype)
        out_d = np.empty((len(q), k), dtype=np.int64)
        chunk = max(1, int(5e7 // max(n, 1)))
        for lo in range(0, len(q), chunk):
            qc = qq[lo:lo + chunk]                       # [c, d]
            dists = np.zeros((len(qc), n), dtype=np.int64)
            for s in range(m):
                qs = qc[:, s * sub:(s + 1) * sub]        # [c, sub]
                diff = qs[:, None, :] - self.codebooks[s][None, :, :]
                lut = (diff * diff).sum(axis=2)          # [c, k_codes]
                dists += lut[:, self.codes[:, s]]        # gather → [c, n]
            part = np.argpartition(dists, kth=k - 1, axis=1)[:, :k]
            for r in range(len(qc)):
                cand = part[r]
                order = sorted(cand,
                               key=lambda c_: (dists[r, c_], self.ids[c_]))
                out_ids[lo + r] = self.ids[order]
                out_d[lo + r] = dists[r, order]
        return out_ids, out_d


def ann_join_pq(
    left: DataFrame,
    right: DataFrame,
    index: BroadcastPQIndex,
    left_id_col: str,
    left_emb_col: str,
    right_id_col: str,
    right_emb_col: str,
    K: int,
    candidates: Optional[int] = None,
    id_out: str = "match_id",
    score_out: str = "_scores",
    tie_col: Optional[str] = None,
) -> DataFrame:
    """K-NN join when the right side is too big to broadcast raw: the
    standard two-stage compressed-candidates + exact-rerank shape.

    ``tie_col`` (a RIGHT-side column) customizes the rerank tie order:
    rows with equal rounded score rank by (tie_col ASC, id ASC) instead
    of internal id alone — how sem_sim_join's ``tie_break`` reaches this
    tier. It rides the existing candidate join (one extra narrow
    column), no additional shuffle.

    1. **Candidate generation, zero shuffle**: each left task probes the
       PQ broadcast (codes only) for ``candidates`` (default 4K)
       approximate neighbor ids per row — no float matrix in memory, no
       exchange.
    2. **Distributed exact rerank**: the narrow (left row, candidate id)
       relation joins ``right`` on the id — per left row only
       ``candidates`` rows cross the shuffle, never the |left|x|right|
       product — then fold-exact cosine (``pair_cosine``) and a
       per-left-id ``row_number`` keeps the true top ``K``. The rerank
       window key is ``left_id_col`` (must be unique), bounded at
       ``candidates`` rows per key — skew-free by construction.

    Recall depends on ``candidates`` and PQ resolution, like any
    IVF-PQ/refine pipeline; raise ``candidates`` (or nbits/m at index
    build) to trade compute for recall.
    """
    from pyspark.sql import Window

    from lotus_spark.functions.vectors import pair_cosine

    c = candidates if candidates is not None else max(4 * K, K)
    if c < K:
        raise ValueError(f"candidates={c} must be >= K={K}")
    spark_ids_are_int = np.issubdtype(index.ids.dtype, np.integer)
    # candidate stages carry ONLY (left id, left emb) — r9: the emb must
    # ride per candidate (the exact rerank needs it), but the left
    # table's payload columns must not multiply by ``candidates`` through
    # the rerank join and rank window; they rejoin once at the end, K
    # rows per left row
    lq = left.select(left_id_col, left_emb_col)
    cand_schema = StructType(
        lq.schema.fields
        + [StructField(id_out, LongType() if spark_ids_are_int else
                       ArrayType(DoubleType()).elementType)]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            q = np.stack(pdf[left_emb_col].map(np.asarray).to_list())
            ids, _ = index.search(q, c)
            kk = ids.shape[1]
            rep = pdf.loc[pdf.index.repeat(kk)].reset_index(drop=True)
            rep[id_out] = ids.reshape(-1)
            yield rep

    cand = lq.mapInPandas(gen, schema=cand_schema)
    right_cols = [
        F.col(right_id_col).alias(id_out),
        F.col(right_emb_col).alias("__pq_r_emb"),
    ]
    if tie_col is not None:
        right_cols.append(F.col(tie_col).alias("__pq_tie"))
    right_sel = right.select(*right_cols)
    scored = (
        cand.join(right_sel, id_out)
        .withColumn(
            score_out,
            F.round(pair_cosine(F.col(left_emb_col),
                                F.col("__pq_r_emb")), 6),
        )
        .drop("__pq_r_emb")
    )
    order = [F.desc(score_out)]
    if tie_col is not None:
        order.append(F.asc("__pq_tie"))
    order.append(F.asc(id_out))
    w = Window.partitionBy(left_id_col).orderBy(*order)
    topk = (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= K)
        .select(left_id_col, id_out, score_out, "_rank")
    )
    return left.join(topk, left_id_col)


class QdrantVS:
    """Qdrant-backed vector store (reference ``lotus/vector_store/qdrant_vs``).

    Thin adapter with the same ``search(queries, K) -> (ids, scores)``
    contract as :class:`BroadcastVectorIndex`; the client is created lazily
    per process (object ships as config). Requires ``qdrant-client``.

    ``location`` selects qdrant-client's EMBEDDED local mode (no server:
    ``":memory:"`` or a directory path) — the executed-test tier
    (``tests/test_integration_optional.py``) and the single-process dev
    shape; ``url`` remains the server mode for production. Embedded
    ``":memory:"`` state is per-process: shipping such a VS to executors
    gives each an EMPTY store — distribute only the server mode.
    """

    def __init__(self, collection: str, url: str = "http://localhost:6333",
                 api_key: Optional[str] = None,
                 location: Optional[str] = None):
        self.collection = collection
        self.url = url
        self.api_key = api_key
        self.location = location
        self._client = None

    def _c(self):
        if self._client is None:
            try:
                from qdrant_client import QdrantClient  # type: ignore
            except ImportError as e:  # pragma: no cover - dep present in CI
                raise RuntimeError(
                    "qdrant-client is not installed; use BroadcastVectorIndex "
                    "for the in-memory tier"
                ) from e
            if self.location is not None:
                self._client = QdrantClient(location=self.location)
            else:
                self._client = QdrantClient(url=self.url,
                                            api_key=self.api_key)
        return self._client

    def ensure_collection(self, dim: int, distance: str = "Cosine") -> None:
        """Create the collection (cosine by default) if absent."""
        from qdrant_client.models import Distance, VectorParams  # type: ignore

        c = self._c()
        if not c.collection_exists(self.collection):
            c.create_collection(
                self.collection,
                vectors_config=VectorParams(
                    size=dim, distance=Distance(distance)),
            )

    def upsert(self, ids, vectors) -> None:
        from qdrant_client.models import PointStruct  # type: ignore

        self._c().upsert(self.collection, [
            PointStruct(id=int(i), vector=[float(x) for x in v])
            for i, v in zip(ids, vectors)
        ])

    def search(self, queries, K: int):
        c = self._c()
        ids, scores = [], []
        for q in np.atleast_2d(np.asarray(queries, dtype=np.float32)):
            if hasattr(c, "query_points"):
                hits = c.query_points(self.collection, query=q.tolist(),
                                      limit=K).points
            else:  # pragma: no cover - pre-1.10 clients
                hits = c.search(self.collection, q.tolist(), limit=K)
            ids.append([h.id for h in hits])
            scores.append([h.score for h in hits])
        return np.asarray(ids), np.asarray(scores, dtype=np.float32)

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_client"] = None
        return d


class WeaviateVS:
    """Weaviate-backed vector store (reference ``lotus/vector_store/
    weaviate_vs``); same lazy-client config-only shape as QdrantVS."""

    def __init__(self, collection: str, url: str = "http://localhost:8080",
                 api_key: Optional[str] = None):
        self.collection = collection
        self.url = url
        self.api_key = api_key
        self._client = None

    def _c(self):  # pragma: no cover - weaviate not in this container
        if self._client is None:
            try:
                import weaviate  # type: ignore
            except ImportError as e:
                raise RuntimeError(
                    "weaviate-client is not installed; use "
                    "BroadcastVectorIndex for the in-memory tier"
                ) from e
            self._client = weaviate.connect_to_custom(http_host=self.url)
        return self._client

    def search(self, queries, K: int):  # pragma: no cover
        ids, scores = [], []
        coll = self._c().collections.get(self.collection)
        for q in np.atleast_2d(np.asarray(queries, dtype=np.float32)):
            res = coll.query.near_vector(q.tolist(), limit=K,
                                         return_metadata=["distance"])
            ids.append([o.uuid for o in res.objects])
            scores.append([1.0 - (o.metadata.distance or 0.0)
                           for o in res.objects])
        return np.asarray(ids), np.asarray(scores, dtype=np.float32)

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_client"] = None
        return d
