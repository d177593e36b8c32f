"""ColBERTv2 late-interaction retriever (reference
``lotus/models/colbertv2_rm.py:26-140`` surface parity).

Protocol: ``index(docs, index_dir)`` → ``load_index(index_dir)`` →
``__call__(queries, K) -> RMOutput(distances, indices)``. The real ColBERT
stack (``colbert-ai``) is a heavyweight optional dependency — it imports
lazily at call time, exactly like SentenceTransformersRM.

``backend="hash"`` is a functional deterministic stand-in implementing the
same LATE-INTERACTION scoring shape (per-token embeddings, MaxSim sum)
with HashRM token vectors, so the full index→persist→load→search protocol
is exercised hermetically; scores are not ColBERT-quality but the operator
contract and data flow are identical.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Any

import numpy as np


@dataclass
class RMOutput:
    """Search result container (reference ``lotus/types.py`` RMOutput)."""

    distances: list[list[float]] = field(default_factory=list)
    indices: list[list[int]] = field(default_factory=list)


class _HashLateInteraction:
    """Deterministic late-interaction backend: per-token HashRM embeddings,
    MaxSim scoring — score(q, d) = Σ_t max_s (q_t · d_s)."""

    def __init__(self, dim: int = 32, seed: int = 42):
        from lotus_spark.models.rm import HashRM

        self.rm = HashRM(dim=dim, seed=seed)

    def encode_tokens(self, text: str) -> np.ndarray:
        toks = text.split() or [""]
        return self.rm(toks)  # (n_tokens, dim), rows l2-normalized

    def score(self, q_toks: np.ndarray, d_toks: np.ndarray) -> float:
        sims = q_toks @ d_toks.T  # (nq, nd)
        return float(sims.max(axis=1).sum())


class ColBERTv2RM:
    """Index/search retriever with the reference's ColBERTv2RM surface."""

    def __init__(self, backend: str = "colbert", **kwargs: Any):
        self.docs: list[str] | None = None
        self.kwargs: dict[str, Any] = {"doc_maxlen": 300, "nbits": 2, **kwargs}
        self.index_dir: str | None = None
        self.backend = backend
        self._hash = _HashLateInteraction() if backend == "hash" else None
        self._doc_token_vecs: list[np.ndarray] | None = None

    # -- indexing -----------------------------------------------------------
    def index(self, docs: list[str], index_dir: str, **kwargs: Any) -> None:
        if self.backend == "hash":
            os.makedirs(index_dir, exist_ok=True)
            vecs = [self._hash.encode_tokens(d) for d in docs]
            with open(os.path.join(index_dir, "docs.pkl"), "wb") as fp:
                pickle.dump({"docs": docs, "vecs": vecs}, fp)
            self.docs, self._doc_token_vecs = docs, vecs
            self.index_dir = index_dir
            return
        try:  # pragma: no cover - colbert-ai absent in this container
            from colbert import Indexer
            from colbert.infra import ColBERTConfig, Run, RunConfig
        except ImportError as e:
            raise RuntimeError(
                "colbert-ai not installed; use backend='hash' for hermetic "
                "runs"
            ) from e
        kw = {**self.kwargs, **kwargs}  # pragma: no cover
        with Run().context(  # pragma: no cover
            RunConfig(nranks=1, experiment="lotus_spark")
        ):
            config = ColBERTConfig(
                doc_maxlen=kw["doc_maxlen"], nbits=kw["nbits"],
                kmeans_niters=4,
            )
            Indexer(
                checkpoint="colbert-ir/colbertv2.0", config=config
            ).index(name=f"{index_dir}/index", collection=docs, overwrite=True)
        self.docs, self.index_dir = docs, index_dir  # pragma: no cover

    def load_index(self, index_dir: str) -> None:
        if self.backend == "hash":
            with open(os.path.join(index_dir, "docs.pkl"), "rb") as fp:
                payload = pickle.load(fp)
            self.docs = payload["docs"]
            self._doc_token_vecs = payload["vecs"]
            self.index_dir = index_dir
            return
        self.index_dir = index_dir  # pragma: no cover

    # -- search -------------------------------------------------------------
    def __call__(self, queries: str | list[str], K: int, **kwargs: Any) -> RMOutput:
        if isinstance(queries, str):
            queries = [queries]
        if self.backend == "hash":
            if self._doc_token_vecs is None:
                raise ValueError("no index loaded: call index() or load_index()")
            out = RMOutput()
            for q in queries:
                q_toks = self._hash.encode_tokens(q)
                scores = np.array([
                    self._hash.score(q_toks, d) for d in self._doc_token_vecs
                ])
                # score DESC, index ASC tie-break (deterministic)
                order = np.lexsort((np.arange(len(scores)), -scores))[:K]
                out.distances.append([float(scores[i]) for i in order])
                out.indices.append([int(i) for i in order])
            return out
        try:  # pragma: no cover - colbert-ai absent in this container
            from colbert import Searcher
            from colbert.infra import Run, RunConfig
        except ImportError as e:
            raise RuntimeError(
                "colbert-ai not installed; use backend='hash' for hermetic "
                "runs"
            ) from e
        with Run().context(  # pragma: no cover
            RunConfig(experiment="lotus_spark")
        ):
            searcher = Searcher(
                index=f"{self.index_dir}/index", collection=self.docs
            )
        out = RMOutput()  # pragma: no cover
        for q in queries:  # pragma: no cover
            ids, _, scores = searcher.search(q, k=K)
            out.indices.append(list(ids))
            out.distances.append([float(s) for s in scores])
        return out  # pragma: no cover
