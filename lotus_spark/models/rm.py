"""Embedding model (RM) interface + deterministic fake.

Reference: ``lotus/models/rm.py:10-85`` — ``_embed(docs) -> ndarray`` with
SentenceTransformers / LiteLLM / ColBERT implementations. In lotus_spark the
RM runs inside an Arrow-batched pandas_udf returning ``array<float>``; the
model is loaded once per executor (lazy init), never on the driver.

``HashRM`` is the deterministic stand-in: a seeded feature-hashing embedding
(token → bucket, l2-normalized counts). It is stable across processes and
platforms, so embedding-op tests and DuckDB oracles are exactly reproducible.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np


class RM:
    """Abstract embedding model."""

    dim: int = 0

    def _embed(self, docs: list[str]) -> np.ndarray:
        raise NotImplementedError

    def __call__(self, docs: list[str]) -> np.ndarray:
        if not docs:
            return np.zeros((0, self.dim), dtype=np.float32)
        return self._embed(docs)

    def cache_key(self) -> str:
        """Stable cross-process identity for plan/checkpoint addressing."""
        from lotus_spark.models.lm import stable_config_token

        return f"{type(self).__qualname__}:{stable_config_token(self)}"


class HashRM(RM):
    """Deterministic feature-hashing embeddings (seeded, l2-normalized).

    Token buckets come from blake2b(token || seed) so the mapping is stable
    across Python processes (unlike builtin ``hash``). Cheap enough to run
    on 100 TB of text inside a pandas_udf without any model weights.
    """

    def __init__(self, dim: int = 64, seed: int = 42, lowercase: bool = True):
        self.dim = dim
        self.seed = seed
        self.lowercase = lowercase

    def _bucket(self, token: str) -> tuple[int, float]:
        h = hashlib.blake2b(
            f"{token}\x00{self.seed}".encode(), digest_size=8
        ).digest()
        v = int.from_bytes(h, "big")
        return v % self.dim, 1.0 if (v >> 63) & 1 else -1.0

    def _embed(self, docs: list[str]) -> np.ndarray:
        out = np.zeros((len(docs), self.dim), dtype=np.float64)
        for i, doc in enumerate(docs):
            text = doc.lower() if self.lowercase else doc
            for tok in text.split():
                b, sign = self._bucket(tok)
                out[i, b] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return (out / norms).astype(np.float32)


class SentenceTransformersRM(RM):
    """Real embedding model (optional dependency, lazily imported per executor)."""

    def __init__(self, model: str = "intfloat/e5-base-v2", batch_size: int = 64):
        self.model_name = model
        self.batch_size = batch_size
        self._model: Any = None
        self.dim = -1  # discovered on first embed

    def _embed(self, docs: list[str]) -> np.ndarray:
        if self._model is None:
            try:
                from sentence_transformers import SentenceTransformer  # type: ignore
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "sentence-transformers not installed; use HashRM for hermetic runs"
                ) from e
            self._model = SentenceTransformer(self.model_name)
        emb = self._model.encode(
            docs, batch_size=self.batch_size, normalize_embeddings=True
        )
        self.dim = emb.shape[1]
        return np.asarray(emb, dtype=np.float32)

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_model"] = None  # never ship live model weights driver→executor
        return d


class LiteLLMRM(RM):
    """API-backed embeddings through litellm (reference
    ``lotus/models/litellm_rm.py:11-81`` semantics): batched ``embedding()``
    calls of at most ``max_batch_size`` docs, optional per-doc character
    ``truncate_limit``, rows returned in request order.

    ``transport`` injects the embedding callable for hermetic tests (and is
    how an executor-local stub can be wired); by default the real
    ``litellm.embedding`` is imported lazily on first use — per executor,
    never at module import, matching SentenceTransformersRM's pattern.
    """

    def __init__(
        self,
        model: str = "text-embedding-3-small",
        max_batch_size: int = 64,
        truncate_limit: int | None = None,
        transport: Any = None,
    ):
        self.model = model
        self.max_batch_size = max_batch_size
        self.truncate_limit = truncate_limit
        self._transport = transport
        self.dim = -1  # discovered on first embed

    def _embed(self, docs: list[str]) -> np.ndarray:
        fn = self._transport
        if fn is None:
            try:
                from litellm import embedding as fn  # type: ignore
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "litellm not installed; pass transport= or use HashRM "
                    "for hermetic runs"
                ) from e
            self._transport = fn
        if self.truncate_limit is not None:
            docs = [d[: self.truncate_limit] for d in docs]
        rows: list[list[float]] = []
        for s in range(0, len(docs), self.max_batch_size):
            resp = fn(model=self.model, input=docs[s : s + self.max_batch_size])
            data = resp["data"] if isinstance(resp, dict) else resp.data
            # API may reorder; restore request order by the index field
            ordered = sorted(
                data,
                key=lambda item: (
                    item["index"] if isinstance(item, dict) else item.index
                ),
            )
            rows.extend(
                item["embedding"] if isinstance(item, dict) else item.embedding
                for item in ordered
            )
        out = np.asarray(rows, dtype=np.float32)
        if out.ndim == 2:
            self.dim = out.shape[1]
        return out

    def __getstate__(self):
        d = dict(self.__dict__)
        # a captured real client is not picklable driver→executor; the
        # executor re-imports lazily. Probe with cloudpickle (what Spark
        # actually ships closures with) so injected test transports survive.
        try:
            from pyspark import cloudpickle

            cloudpickle.dumps(d["_transport"])
        except Exception:
            d["_transport"] = None
        return d
