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
