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
    "load_sem_index",
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


def _stable_token(v: Any) -> str:
    """Cross-process-stable string identity for a plan-node argument.

    Model objects (lm=/rm=) expose ``cache_key()``; plain callables hash
    by module-qualified name (NOT their class — every function shares
    ``type(...) == function``, which would collide all of them onto one
    key); anything else whose repr embeds a memory address (default
    ``object.__repr__``) falls back to class + the shared
    ``stable_config_token`` — a bare ``repr()`` would make checkpoint
    keys differ every process, silently defeating cross-run resume
    (round-3 advice)."""
    ck = getattr(v, "cache_key", None)
    if callable(ck):
        return str(ck())
    if callable(v):
        from lotus_spark.models.lm import callable_token

        # name + bytecode digest: editing a UDF body between runs changes
        # the checkpoint key instead of silently resuming a stale result
        return callable_token(v)
    r = repr(v)
    if " at 0x" in r:
        from lotus_spark.models.lm import stable_config_token

        return (f"{type(v).__module__}.{type(v).__qualname__}"
                f"({stable_config_token(v)})")
    return r


def _fs_exists(spark, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API, so checkpoint
    dirs work on any Spark-supported filesystem (hdfs://, s3a://, file:)
    — not just the driver's local disk."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


@dataclass(frozen=True)
class OpNode:
    """One recorded operation: a semantic op name or a native DataFrame call."""

    op: str                       # e.g. "sem_filter" or "native:filter"
    args: tuple = ()
    kwargs: dict = field(default_factory=dict)
    fn: Optional[Callable] = None  # for from_fn nodes
    child: Any = None  # LazyFrame | DataFrame for union_with/join_with

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
    """Immutable fluent builder: each call returns a new LazyFrame.

    MULTI-INPUT pipelines (reference ``ast/lazyframe.py`` SourceNode
    bindings + ``concat``, ``tests/test_ast.py:24-50``): a LazyFrame may
    name its source (``LazyFrame.from_source("left")``) and ``execute``
    then accepts a ``{name: DataFrame}`` dict; ``union_with`` /
    ``join_with`` nodes carry a child LazyFrame (resolved against the
    same sources dict) or a concrete DataFrame. The reference's
    ``concat(axis=1)`` column-concat has no Spark-natural analog
    (row alignment) — ``join_with`` on keys is the restatement;
    ``concat(axis=0)`` maps to chained ``union_with``.
    """

    def __init__(self, ops: Optional[list[OpNode]] = None,
                 source: Optional[str] = None):
        self._ops: list[OpNode] = list(ops or [])
        self._source = source

    @classmethod
    def from_source(cls, name: str) -> "LazyFrame":
        """A LazyFrame bound to the named entry of the sources dict
        passed to :meth:`execute` (reference SourceNode binding)."""
        return cls(source=name)

    @classmethod
    def concat(cls, frames: list["LazyFrame"]) -> "LazyFrame":
        """Row-wise concatenation (reference ``concat(axis=0)``): the
        first frame unioned with each of the rest."""
        if not frames:
            raise ValueError("concat needs at least one LazyFrame")
        out = frames[0]
        for f in frames[1:]:
            out = out.union_with(f)
        return out

    # -- construction -------------------------------------------------------

    def _append(self, node: OpNode) -> "LazyFrame":
        return LazyFrame(self._ops + [node], source=self._source)

    def union_with(self, other, distinct: bool = False) -> "LazyFrame":
        """Union by column name with another pipeline's output (a
        LazyFrame resolved against the same sources dict, or a concrete
        DataFrame). ``distinct=True`` appends a dedup."""
        return self._append(
            OpNode(op="union_with", kwargs={"distinct": distinct},
                   child=other)
        )

    def join_with(self, other, on, how: str = "inner") -> "LazyFrame":
        """Join with another pipeline's output; ``on``/``how`` are passed
        to ``DataFrame.join``."""
        return self._append(
            OpNode(op="join_with", kwargs={"on": on, "how": how},
                   child=other)
        )

    def __getattr__(self, name: str):
        """Record semantic ops and arbitrary native DataFrame methods."""
        if name.startswith("_"):
            raise AttributeError(name)

        def record(*args: Any, **kwargs: Any) -> "LazyFrame":
            op = name if name in SEMANTIC_OPS else f"native:{name}"
            return self._append(OpNode(op=op, args=args, kwargs=kwargs))

        return record

    def from_fn(self, fn: Callable[..., DataFrame], *args: Any,
                checkpoint: bool = False) -> "LazyFrame":
        """Arbitrary DataFrame -> DataFrame function node (reference
        ``lazyframe.py:729-742``). ``checkpoint=True`` marks the node's
        output for parquet checkpointing under ``execute(checkpoint_dir=
        ...)`` — the composition primitive for multi-stage corpus
        pipelines whose expensive stages (dedup, scoring) should resume,
        not recompute, after a mid-pipeline failure."""
        kw = {"checkpoint": True} if checkpoint else {}
        return self._append(OpNode(op="from_fn", args=args, kwargs=kw,
                                   fn=fn))

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
        return LazyFrame(ops, source=self._source)

    # -- execution ----------------------------------------------------------

    def _prefix_keys(self, source_token) -> list[Optional[str]]:
        """Content-address every plan prefix: key_i = H(key_{i-1} || node_i).

        The reference caches per-node results keyed by (node config hash,
        input content hash) (``lotus/ast/run.py:128-160``,
        ``ast/cache.py:62-79``). Content-hashing a distributed DataFrame is
        itself a full job, so the Spark restatement keys on the *plan
        prefix* + a caller-supplied source token (e.g. input path +
        snapshot version) — same reuse semantics whenever the source is
        versioned, zero extra jobs. ``from_fn`` nodes hash by qualname +
        bytecode digest (``callable_token``), so editing a UDF body
        changes the key; closure *values* captured by reference remain
        the caller's responsibility, as with the reference's
        callable-by-identity hashing.

        ``source_token`` is a str (single-source pipelines) or a
        ``{source_name: token}`` dict (multi-input). A ``union_with`` /
        ``join_with`` child's DATA identity must reach the key too, or
        regenerating the secondary table in place would silently resume
        stale merged results — so a named-source child folds ITS token
        (from the dict) into its own ``_prefix_keys`` chain. When no
        token exists for a child's data — a concrete-DataFrame child, or
        a named child with no dict entry — the key for that node and
        every later node is ``None``: those prefixes are never written
        or resumed (a constant placeholder tag would collide two
        different inputs onto one key, a false checkpoint HIT — worse
        than recomputing)."""
        import hashlib

        from lotus_spark.models.lm import callable_token

        if isinstance(source_token, dict):
            if self._source is not None and self._source in source_token:
                primary = f"{self._source}:{source_token[self._source]}"
            elif self._source is None and len(source_token) == 1:
                primary = next(iter(source_token.values()))
            else:
                primary = None
        else:
            primary = source_token
        keys: list[Optional[str]] = []
        if primary is None:
            return [None] * len(self._ops)
        disabled = False
        h = hashlib.blake2b(primary.encode(), digest_size=16)
        for node in self._ops:
            fn_tag = callable_token(node.fn) if node.fn else ""
            if node.child is not None:
                if isinstance(node.child, LazyFrame):
                    ck = node.child._prefix_keys(source_token)
                    if ck and ck[-1] is None:
                        disabled = True
                    elif not ck:
                        # op-less child: its identity is its source token
                        cname = node.child._source
                        if (isinstance(source_token, dict)
                                and cname in source_token):
                            fn_tag += (
                                f"|child:src:{cname}:{source_token[cname]}"
                            )
                        else:
                            disabled = True
                    else:
                        fn_tag += f"|child:{ck[-1]}"
                else:
                    # concrete DataFrame child: no cross-run-stable
                    # identity exists — bind named sources + a token dict
                    # when checkpoint resume matters
                    disabled = True
            args = [_stable_token(a) for a in node.args]
            kwargs = sorted(
                (k, _stable_token(v)) for k, v in node.kwargs.items()
            )
            part = f"{node.op}|{args!r}|{kwargs!r}|{fn_tag}"
            h = hashlib.blake2b(
                h.digest() + part.encode(), digest_size=16
            )
            keys.append(None if disabled else h.hexdigest())
        return keys

    def _resolve_input(self, df):
        """``df`` is a DataFrame (single-source pipeline) or a
        ``{name: DataFrame}`` dict (multi-input; this frame reads its
        ``_source`` entry)."""
        if isinstance(df, DataFrame):
            return df
        if isinstance(df, dict):
            key = self._source
            if key is None:
                if len(df) == 1:
                    return next(iter(df.values()))
                raise ValueError(
                    "multi-source execute() needs this LazyFrame bound "
                    "via LazyFrame.from_source(name); got sources "
                    f"{sorted(df)}"
                )
            if key not in df:
                raise KeyError(
                    f"source {key!r} not in provided sources {sorted(df)}"
                )
            return df[key]
        raise TypeError(f"execute() takes a DataFrame or dict, got {type(df)}")

    def execute(
        self,
        df,
        checkpoint_dir: Optional[str] = None,
        source_token: Optional[str] = None,
    ) -> DataFrame:
        """Replay the recorded ops onto ``df`` (a DataFrame, or a
        ``{name: DataFrame}`` dict for multi-input pipelines).

        With ``checkpoint_dir`` + ``source_token``, semantic-node outputs
        (and ``from_fn(checkpoint=True)`` outputs) are persisted as
        parquet addressed by the plan prefix; a re-run of the same
        (source, plan prefix) resumes from the longest existing
        checkpoint instead of re-paying the LLM / dedup stages.

        ``source_token`` is a str for single-source pipelines, or a
        ``{source_name: token}`` dict for multi-input ones — every
        ``union_with``/``join_with`` child's source needs its own token
        or checkpointing is disabled from that node on (see
        ``_prefix_keys``).
        """
        import lotus_spark as ls

        sources = df
        keys = None
        start = 0
        cur = self._resolve_input(df)
        spark = cur.sparkSession
        base = (checkpoint_dir or "").rstrip("/")
        if checkpoint_dir is not None and source_token is not None:
            if isinstance(sources, dict) and isinstance(source_token, str):
                # A single str token cannot name which of the several
                # input tables it versions: _prefix_keys would key an
                # op-ful union/join child by the PARENT's token while
                # the child executes on sources[child._source] —
                # regenerating the child's table in place would then
                # silently resume stale post-join checkpoints (exactly
                # the false-hit class dict tokens exist to prevent).
                raise ValueError(
                    "multi-source execute() with checkpointing needs a "
                    "{source_name: token} dict, got a single str token"
                )
            keys = self._prefix_keys(source_token)
            for i in range(len(self._ops) - 1, -1, -1):
                if keys[i] is None:
                    continue
                ck = f"{base}/{keys[i]}"
                if _fs_exists(spark, f"{ck}/_SUCCESS"):
                    cur = spark.read.parquet(ck)
                    start = i + 1
                    # touch the entry: resume only READS, so without
                    # this a max-age sweep (e.g. __spark_entry__'s
                    # _sweep_stale_checkpoints) would evict checkpoints
                    # that are hit daily
                    try:
                        import os as _os

                        if ck.startswith("/") and _os.path.exists(ck):
                            _os.utime(ck)
                    except OSError:
                        pass
                    break
        def _checkpoint(cur: DataFrame, i: int) -> DataFrame:
            ck = f"{base}/{keys[i]}"
            cur.write.mode("overwrite").parquet(ck)
            return spark.read.parquet(ck)

        def _child_df(node: OpNode) -> DataFrame:
            other = node.child
            if isinstance(other, LazyFrame):
                # resolved against the SAME sources mapping; child stages
                # run un-checkpointed (the combined node's own checkpoint
                # covers the merged result)
                return other.execute(sources)
            if isinstance(other, DataFrame):
                return other
            raise TypeError(
                f"{node.op} child must be a LazyFrame or DataFrame, "
                f"got {type(other)}"
            )

        for i in range(start, len(self._ops)):
            node = self._ops[i]
            if node.op == "from_fn":
                cur = node.fn(cur, *node.args)
                if (keys is not None and keys[i] is not None
                        and node.kwargs.get("checkpoint")):
                    cur = _checkpoint(cur, i)
            elif node.op == "union_with":
                cur = cur.unionByName(_child_df(node))
                if node.kwargs.get("distinct"):
                    cur = cur.dropDuplicates()
            elif node.op == "join_with":
                cur = cur.join(_child_df(node), node.kwargs["on"],
                               node.kwargs.get("how", "inner"))
            elif node.is_semantic:
                fn = getattr(ls, node.op)
                cur = fn(cur, *node.args, **node.kwargs)
                if keys is not None and keys[i] is not None:
                    cur = _checkpoint(cur, i)
            elif node.is_native:
                method = node.op.split(":", 1)[1]
                cur = getattr(cur, method)(*node.args, **node.kwargs)
            else:
                raise ValueError(f"unknown op {node.op!r}")
        return cur

    # -- persistence / introspection ---------------------------------------

    def save(self, path: str) -> None:
        for node in self._ops:
            if isinstance(node.child, DataFrame):
                raise ValueError(
                    f"{node.op} node holds a concrete DataFrame — not "
                    "picklable; bind it as a named source "
                    "(LazyFrame.from_source) to save this pipeline"
                )
        with open(path, "wb") as f:
            pickle.dump((self._ops, self._source), f)

    @classmethod
    def load(cls, path: str) -> "LazyFrame":
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if isinstance(payload, tuple):
            ops, source = payload
            return cls(ops, source=source)
        return cls(payload)  # pre-multi-input save files

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
