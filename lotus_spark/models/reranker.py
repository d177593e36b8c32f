"""Reranker interface (reference ``lotus/models/reranker.py:6-13``):
``(query, docs, K) -> indices`` of the K best docs, best first.

Used by ``sem_search(n_rerank=...)`` on the already-reduced top-K candidate
set, so reranking is driver-side and O(K) — the distributed work (embedding
scan + top-K) happened before it.
"""

from __future__ import annotations

from typing import Any, Sequence


class Reranker:
    """Abstract cross-encoder-style reranker."""

    def __call__(self, query: str, docs: Sequence[str], K: int) -> list[int]:
        raise NotImplementedError


class HashReranker(Reranker):
    """Deterministic reranker for hermetic tests: scores by HashRM cosine
    (a 'cross-encoder' whose scoring function happens to be bi-encoder math,
    but exercised through the reranker code path)."""

    def __init__(self, dim: int = 64, seed: int = 42):
        from lotus_spark.models.rm import HashRM

        self.rm = HashRM(dim=dim, seed=seed)

    def __call__(self, query: str, docs: Sequence[str], K: int) -> list[int]:
        import numpy as np

        if not docs:
            return []
        vecs = np.asarray(self.rm(list(docs)))
        q = np.asarray(self.rm([query])[0])
        scores = vecs @ q
        order = sorted(range(len(docs)), key=lambda i: (-scores[i], i))
        return order[:K]


class PolyHashReranker(Reranker):
    """Deterministic demo reranker whose scoring is exactly SQL-expressible
    (the polynomial char fold ``(acc*31 + ord(c)) % MOD`` from
    ``functions.text.shingle_hash``): score desc, candidate order as tie.
    Used by the driver-checked ``sem_search_rerank`` oracle query."""

    def __call__(self, query: str, docs: Sequence[str], K: int) -> list[int]:
        from lotus_spark.functions.text import MOD

        def strhash(s: str) -> int:
            acc = 0
            for ch in s:
                acc = (acc * 31 + ord(ch)) % MOD
            return acc

        order = sorted(range(len(docs)), key=lambda i: (-strhash(docs[i]), i))
        return order[:K]


class CrossEncoderReranker(Reranker):
    """Real cross-encoder (optional dependency; reference
    ``lotus/models/cross_encoder_reranker.py``). Lazily imports
    sentence_transformers on first call so the object ships as config."""

    def __init__(self, model: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
                 batch_size: int = 64, **kwargs: Any):
        self.model = model
        self.batch_size = batch_size
        self.kwargs = kwargs
        self._ce = None

    def _load(self):
        if self._ce is None:
            try:
                from sentence_transformers import CrossEncoder  # type: ignore
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "sentence_transformers is not installed; use HashReranker "
                    "for hermetic runs"
                ) from e
            self._ce = CrossEncoder(self.model, **self.kwargs)
        return self._ce

    def __call__(self, query: str, docs: Sequence[str], K: int) -> list[int]:
        ce = self._load()
        scores = ce.predict([(query, d) for d in docs],
                            batch_size=self.batch_size)
        order = sorted(range(len(docs)), key=lambda i: (-float(scores[i]), i))
        return order[:K]

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_ce"] = None
        return d
