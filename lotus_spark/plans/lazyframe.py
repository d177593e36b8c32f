"""LazyFrame — a lazy semantic-pipeline builder over Spark DataFrames.

The reference's LazyFrame (``lotus/ast/lazyframe.py:83-131``) records ops as
an immutable linear list of AST nodes and executes them on ``.execute(df)``;
unknown attributes proxy to pandas ops (``:662-674``); pipelines pickle via
``save``/``load`` (``:802-834``).

Spark restatement: Spark DataFrames are *already* lazy relational plans, so
this layer only needs to record the **semantic** ops (whose instructions and
model configs our optimizers rewrite — Catalyst can't see inside an LLM UDF)
interleaved with opaque native transforms. Executing replays the ops onto a
DataFrame; optimizers are pure functions ``list[OpNode] -> list[OpNode]``.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field, replace
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame

SEMANTIC_OPS = {
    "sem_map",
    "sem_filter",
    "sem_extract",
    "sem_join",
    "sem_agg",
    "sem_topk",
    "sem_index",
    "sem_search",
    "sem_sim_join",
    "sem_cluster_by",
    "sem_dedup",
    "sem_partition_by",
    "llm_as_judge",
    "pairwise_judge",
}

# ops that only remove rows (never add/rename columns) in their default mode —
# the safety condition for reordering native filters ahead of them
_ROW_REDUCING = {"sem_filter", "sem_search", "sem_topk", "sem_dedup"}


@dataclass(frozen=True)
class OpNode:
    """One recorded operation: a semantic op name or a native DataFrame call."""

    op: str                       # e.g. "sem_filter" or "native:filter"
    args: tuple = ()
    kwargs: dict = field(default_factory=dict)
    fn: Optional[Callable] = None  # for from_fn nodes

    @property
    def is_semantic(self) -> bool:
        return self.op in SEMANTIC_OPS

    @property
    def is_native(self) -> bool:
        return self.op.startswith("native:")

    @property
    def is_cheap_filter(self) -> bool:
        return self.op in ("native:filter", "native:where")

    def row_reducing_only(self) -> bool:
        if self.op in _ROW_REDUCING:
            return not self.kwargs.get("return_all", False)
        return False

    def describe(self) -> str:
        kw = {k: v for k, v in self.kwargs.items() if k not in ("lm", "rm", "helper_lm")}
        arg_s = ", ".join(
            [repr(a) for a in self.args if not isinstance(a, DataFrame)]
            + [f"{k}={v!r}" for k, v in kw.items()]
        )
        return f"{self.op}({arg_s})"


class LazyFrame:
    """Immutable fluent builder: each call returns a new LazyFrame."""

    def __init__(self, ops: Optional[list[OpNode]] = None):
        self._ops: list[OpNode] = list(ops or [])

    # -- construction -------------------------------------------------------

    def _append(self, node: OpNode) -> "LazyFrame":
        return LazyFrame(self._ops + [node])

    def __getattr__(self, name: str):
        """Record semantic ops and arbitrary native DataFrame methods."""
        if name.startswith("_"):
            raise AttributeError(name)

        def record(*args: Any, **kwargs: Any) -> "LazyFrame":
            op = name if name in SEMANTIC_OPS else f"native:{name}"
            return self._append(OpNode(op=op, args=args, kwargs=kwargs))

        return record

    def from_fn(self, fn: Callable[..., DataFrame], *args: Any) -> "LazyFrame":
        """Arbitrary DataFrame -> DataFrame function node (reference
        ``lazyframe.py:729-742``)."""
        return self._append(OpNode(op="from_fn", args=args, fn=fn))

    @property
    def ops(self) -> list[OpNode]:
        return list(self._ops)

    # -- optimization -------------------------------------------------------

    def optimize(self, optimizers=None, **opt_kwargs: Any) -> "LazyFrame":
        from lotus_spark.plans.optimizers import DEFAULT_OPTIMIZERS

        chain = optimizers if optimizers is not None else DEFAULT_OPTIMIZERS
        ops = self._ops
        for opt in chain:
            ops = opt(ops, **opt_kwargs) if opt_kwargs else opt(ops)
        return LazyFrame(ops)

    # -- execution ----------------------------------------------------------

    def execute(self, df: DataFrame) -> DataFrame:
        import lotus_spark as ls

        cur = df
        for node in self._ops:
            if node.op == "from_fn":
                cur = node.fn(cur, *node.args)
            elif node.is_semantic:
                fn = getattr(ls, node.op)
                cur = fn(cur, *node.args, **node.kwargs)
            elif node.is_native:
                method = node.op.split(":", 1)[1]
                cur = getattr(cur, method)(*node.args, **node.kwargs)
            else:
                raise ValueError(f"unknown op {node.op!r}")
        return cur

    # -- persistence / introspection ---------------------------------------

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self._ops, f)

    @classmethod
    def load(cls, path: str) -> "LazyFrame":
        with open(path, "rb") as f:
            return cls(pickle.load(f))

    def explain(self) -> str:
        lines = ["LazyFrame plan:"]
        for i, node in enumerate(self._ops):
            tag = "SEM " if node.is_semantic else ("fn  " if node.op == "from_fn" else "nat ")
            lines.append(f"  {i:2d} [{tag}] {node.describe()}")
        return "\n".join(lines)

    def __repr__(self) -> str:  # pragma: no cover
        return self.explain()


def replace_node_kwargs(node: OpNode, **kwargs: Any) -> OpNode:
    merged = dict(node.kwargs)
    merged.update(kwargs)
    return replace(node, kwargs=merged)
