"""Logical optimizers over LazyFrame op lists (SURVEY §4.1).

Catalyst already owns relational rewrites (pushdown, pruning, join order).
What it cannot know is that an LLM-UDF stage costs ~10⁶× a comparison — so
these optimizers reorder and parameterize the *semantic* ops:

- ``PredicatePushdownOptimizer`` — bubble cheap native filters ahead of
  consecutive row-reducing semantic ops (reference
  ``ast/optimizer/predicate_pushdown.py:22-87``). Safe because sem_filter
  in non-return_all mode never adds/renames columns.
- ``CascadePrewarmOptimizer`` — run threshold learning once on train data
  and pin the learned (τ⁺, τ⁻) into the node's CascadeArgs (reference
  ``ast/optimizer/cascade.py:24-76``); later executions skip sampling and
  oracle labeling.
- ``InstructionSearchOptimizer`` — GEPA-style evolutionary search over the
  NL instruction: propose candidate rewrites (via an LM or a provided
  generator), score each on train data with a user eval function, keep the
  best (reference ``ast/optimizer/gepa_optimizer.py``; simplified
  single-generation search — the full evolutionary loop plugs in via
  ``generations>1``).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from dataclasses import replace as dc_replace
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotus_spark.plans.lazyframe import LazyFrame, OpNode, replace_node_kwargs


class PredicatePushdownOptimizer:
    """Move native filters before adjacent row-reducing semantic ops."""

    def __call__(self, ops: list[OpNode], **_: Any) -> list[OpNode]:
        out = list(ops)
        changed = True
        while changed:
            changed = False
            for i in range(1, len(out)):
                prev, cur = out[i - 1], out[i]
                if cur.is_cheap_filter and prev.is_semantic and prev.row_reducing_only():
                    out[i - 1], out[i] = cur, prev
                    changed = True
        return out


class CalibrationStore:
    """Shared optimize-time calibration state (round-5 advice item 3).

    ``CascadePrewarmOptimizer`` and ``FilterReorderOptimizer`` both need
    oracle-labeled train rows per filter: τ learning labels a stratified
    sample; selectivity estimation labels a pinned sample. Run
    separately, a pipeline using both optimizers pays the oracle LM
    TWICE per filter. Pass one store to both (prewarm first in the
    chain) and the cascade's labeling pass also records an
    importance-weighted selectivity estimate — Σ(label·w)/Σ(w) with
    w = 1/sampling-fraction, unbiased for P(keep) on train — which the
    reorderer then reads instead of running its own labeling pass.
    Filters the cascade didn't touch still fall back to the reorderer's
    own pinned-sample estimate, which is memoized here too (keyed by
    the filter's instruction string, the same key ``costs`` uses).
    """

    def __init__(self) -> None:
        self._sel: dict[str, float] = {}

    def put_labels(self, instruction: str, labels, weights) -> None:
        import numpy as np

        w = np.asarray(weights, dtype=float)
        lab = np.asarray(labels, dtype=float)
        if len(w) and w.sum() > 0:
            self._sel[instruction] = float((lab * w).sum() / w.sum())

    def put_selectivity(self, instruction: str, sel: float) -> None:
        self._sel[instruction] = float(sel)

    def selectivity(self, instruction: str) -> Optional[float]:
        return self._sel.get(instruction)


class CascadePrewarmOptimizer:
    """Learn cascade thresholds on train data; pin them into the plan.

    ``store`` (a :class:`CalibrationStore`) additionally records each
    labeled sample's selectivity estimate for downstream optimizers."""

    def __init__(self, train_df: Optional[DataFrame] = None,
                 store: Optional[CalibrationStore] = None):
        self.train_df = train_df
        self.store = store

    def __call__(self, ops: list[OpNode], train_df: Optional[DataFrame] = None,
                 **_: Any) -> list[OpNode]:
        import lotus_spark as ls

        train = train_df if train_df is not None else self.train_df
        if train is None:
            return list(ops)
        out = []
        for node in ops:
            cargs = node.kwargs.get("cascade_args")
            if node.op == "sem_filter" and cargs is not None and cargs.tau_pos is None:
                learned = _learn_filter_taus(train, node, self.store)
                if learned is not None:
                    new_cargs = dc_replace(cargs, tau_pos=learned[0], tau_neg=learned[1])
                    node = replace_node_kwargs(node, cascade_args=new_cargs)
            out.append(node)
        return out


def _learn_filter_taus(
    train: DataFrame, node: OpNode,
    store: Optional[CalibrationStore] = None,
) -> Optional[tuple[float, float]]:
    """Run the cascade's calibrate→sample→label→learn phase on train data."""
    from lotus_spark.cascades.filter_cascade import learn_taus_on

    try:
        return learn_taus_on(train, node.args[0], node.kwargs, store=store)
    except Exception:
        return None


class InstructionSearchOptimizer:
    """Search candidate instruction rewrites, keep the best-scoring plan.

    ``eval_fn(result_df) -> float`` scores an executed pipeline on train
    data (higher is better). ``propose_fn(instruction) -> list[str]``
    generates rewrites; defaults to an LM prompt asking for paraphrases
    when ``settings.lm`` is set, else identity.
    """

    def __init__(
        self,
        train_df: DataFrame,
        eval_fn: Callable[[DataFrame], float],
        propose_fn: Optional[Callable[[str], list[str]]] = None,
        generations: int = 1,
        target_ops: tuple[str, ...] = ("sem_filter", "sem_map", "sem_join"),
    ):
        self.train_df = train_df
        self.eval_fn = eval_fn
        self.propose_fn = propose_fn or _lm_paraphrases
        self.generations = generations
        self.target_ops = target_ops

    def __call__(self, ops: list[OpNode], **_: Any) -> list[OpNode]:
        best_ops = list(ops)
        best_score = self._score(best_ops)
        for _gen in range(self.generations):
            improved = False
            for i, node in enumerate(best_ops):
                if node.op not in self.target_ops or not node.args:
                    continue
                instruction = node.args[0]
                if not isinstance(instruction, str):
                    continue
                for cand in self.propose_fn(instruction):
                    trial = list(best_ops)
                    trial[i] = OpNode(
                        op=node.op,
                        args=(cand,) + tuple(node.args[1:]),
                        kwargs=node.kwargs,
                        fn=node.fn,
                    )
                    score = self._score(trial)
                    if score > best_score:
                        best_ops, best_score, improved = trial, score, True
            if not improved:
                break
        return best_ops

    def _score(self, ops: list[OpNode]) -> float:
        try:
            return self.eval_fn(LazyFrame(ops).execute(self.train_df))
        except Exception:
            return float("-inf")


@dataclass(frozen=True)
class ParamPath:
    """Address of one optimizable NL parameter inside an op list (reference
    ``ast/optimizer/gepa_optimizer.py:45-53`` param registry +
    ``nodes.py:90-292`` nested param paths)."""

    node_idx: int
    slot: str = "args"   # "args" | "kwargs"
    key: Any = 0         # tuple index or kwarg name


# per-op optimizable NL parameters (reference gepa_optimizer.py:45-53:
# user_instruction / join_instruction / query / judge criteria)
OPTIMIZABLE_PARAMS: dict[str, list[tuple[str, Any]]] = {
    "sem_filter": [("args", 0)],
    "sem_map": [("args", 0)],
    "sem_join": [("args", 0)],
    "sem_agg": [("args", 0)],
    "sem_topk": [("args", 0)],
    "sem_search": [("kwargs", "query")],
    "llm_as_judge": [("args", 0)],
    "pairwise_judge": [("args", 2)],
}


def _get_param(ops: list[OpNode], p: ParamPath):
    node = ops[p.node_idx]
    if p.slot == "args":
        return node.args[p.key] if p.key < len(node.args) else None
    return node.kwargs.get(p.key)


def _set_param(ops: list[OpNode], p: ParamPath, value: str) -> list[OpNode]:
    out = list(ops)
    node = out[p.node_idx]
    if p.slot == "args":
        args = list(node.args)
        args[p.key] = value
        out[p.node_idx] = OpNode(op=node.op, args=tuple(args),
                                 kwargs=node.kwargs, fn=node.fn)
    else:
        out[p.node_idx] = replace_node_kwargs(node, **{p.key: value})
    return out


def discover_params(ops: list[OpNode]) -> list[ParamPath]:
    """All optimizable NL params in a plan, per the op registry."""
    paths = []
    for i, node in enumerate(ops):
        for slot, key in OPTIMIZABLE_PARAMS.get(node.op, []):
            if isinstance(_get_param(ops, ParamPath(i, slot, key)), str):
                paths.append(ParamPath(i, slot, key))
    return paths


class GEPAOptimizer:
    """Evolutionary instruction search with Pareto selection (reference
    ``ast/optimizer/gepa_optimizer.py:249-366`` — `gepa.optimize_anything`
    over per-node NL params; this is a self-contained reimplementation of
    the loop's structure: population of candidate plans → LM-reflective
    mutation of one param at a time → per-example score vectors → keep the
    Pareto frontier, return the best-total candidate).

    - ``eval_examples``: list of ``(train_df, eval_fn)`` — each eval_fn
      scores an executed pipeline on its df (higher better). Per-example
      scores form the vector used for Pareto pruning, which preserves
      candidates that excel on *different* examples instead of collapsing
      to one greedy winner. A single ``(df, fn)`` degrades gracefully to
      hill-climbing with restarts.
    - ``propose_fn(instruction, feedback) -> list[str]``: mutation
      operator; defaults to an LM reflection prompt including the current
      score feedback. 1-arg callables are also accepted.
    - ``paths``: explicit ``ParamPath`` marks; default = discover from the
      op registry (the reference's ``mark_optimizable`` analog).
    """

    def __init__(
        self,
        eval_examples: list[tuple[DataFrame, Callable[[DataFrame], float]]],
        propose_fn: Optional[Callable] = None,
        generations: int = 3,
        population: int = 6,
        paths: Optional[list[ParamPath]] = None,
    ):
        self.eval_examples = eval_examples
        self.propose_fn = propose_fn or _lm_reflect
        self.generations = generations
        self.population = population
        self.paths = paths

    def _propose(self, instruction: str, feedback: str) -> list[str]:
        try:
            return list(self.propose_fn(instruction, feedback))
        except TypeError:
            return list(self.propose_fn(instruction))

    def _score_vec(self, ops: list[OpNode]) -> list[float]:
        vec = []
        for df, fn in self.eval_examples:
            try:
                vec.append(float(fn(LazyFrame(ops).execute(df))))
            except Exception:
                vec.append(float("-inf"))
        return vec

    @staticmethod
    def _pareto_prune(pool, cap: int):
        """Drop dominated candidates; cap by total score (frontier first)."""
        survivors = []
        for ops_i, vec_i in pool:
            dominated = any(
                all(b >= a for a, b in zip(vec_i, vec_j))
                and any(b > a for a, b in zip(vec_i, vec_j))
                for ops_j, vec_j in pool
                if vec_j is not vec_i
            )
            if not dominated:
                survivors.append((ops_i, vec_i))
        survivors.sort(key=lambda c: -sum(c[1]))
        return survivors[:cap]

    def __call__(self, ops: list[OpNode], **_: Any) -> list[OpNode]:
        paths = self.paths if self.paths is not None else discover_params(ops)
        if not paths:
            return list(ops)
        pool = [(list(ops), self._score_vec(ops))]
        for _gen in range(self.generations):
            new_cands = []
            for pi, path in enumerate(paths):
                # parent choice rotates across the frontier so different
                # Pareto survivors all get mutation budget
                parent_ops, parent_vec = pool[pi % len(pool)]
                cur = _get_param(parent_ops, path)
                if not isinstance(cur, str):
                    continue
                feedback = (
                    f"per-example scores {parent_vec}; "
                    f"op {parent_ops[path.node_idx].op}"
                )
                for cand in self._propose(cur, feedback):
                    if cand == cur:
                        continue
                    trial = _set_param(parent_ops, path, cand)
                    new_cands.append((trial, self._score_vec(trial)))
            if not new_cands:
                break
            pool = self._pareto_prune(pool + new_cands, self.population)
        return max(pool, key=lambda c: sum(c[1]))[0]


def _lm_reflect(instruction: str, feedback: str = "") -> list[str]:
    """LM reflection mutation: rewrite given the observed feedback."""
    from lotus_spark.session import settings

    if settings.lm is None:
        return []
    msgs = [[
        {"role": "system", "content": (
            "You are improving a data-processing instruction. Given the "
            "instruction and evaluation feedback, propose 3 improved "
            "rewrites, one per line, preserving the {column} placeholders "
            "exactly."
        )},
        {"role": "user", "content": f"Instruction: {instruction}\n"
                                    f"Feedback: {feedback}"},
    ]]
    out = settings.lm(msgs).outputs[0]
    cands = [ln.strip("-• \t") for ln in out.splitlines() if ln.strip()]
    return [c for c in cands if "{" in c][:3]


def _lm_paraphrases(instruction: str) -> list[str]:
    from lotus_spark.session import settings

    if settings.lm is None:
        return []
    msgs = [[
        {"role": "system", "content": (
            "Rewrite the given data-processing instruction 3 different ways, "
            "one per line, preserving the {column} placeholders exactly."
        )},
        {"role": "user", "content": instruction},
    ]]
    out = settings.lm(msgs).outputs[0]
    cands = [ln.strip("-• \t") for ln in out.splitlines() if ln.strip()]
    return [c for c in cands if "{" in c][:3]


DEFAULT_OPTIMIZERS = [PredicatePushdownOptimizer()]


class FilterReorderOptimizer:
    """Order runs of consecutive ``sem_filter`` nodes by estimated
    cost-effectiveness — the classic expensive-predicate placement rule
    (Hellerstein's predicate migration, specialized to a conjunctive
    run): evaluate the filter with the best ``(1 - selectivity) / cost``
    first, so later (costlier / less selective) LLM filters see the
    fewest rows. For a conjunction the surviving row SET is
    order-independent, so the rewrite is semantics-preserving; only the
    number of LLM calls changes.

    Selectivities are estimated by running each filter on a PINNED
    sample of ``train_df`` (``limit(sample_rows)`` materialized once via
    persist — cross-job ``limit`` re-evaluation gives no row guarantee,
    so an unpinned sample could score different filters on different
    rows) — the same calibrate-on-train contract as
    CascadePrewarmOptimizer. Per-row costs default to 1 (uniform:
    most-selective-first) and can be overridden via ``costs``, keyed by
    the filter's INSTRUCTION string (stable under other optimizers
    shifting node positions; an absolute-index key would silently bind
    to the wrong node after e.g. predicate pushdown).

    Only adjacent ``sem_filter`` nodes in non-``return_all`` mode with
    no UNLEARNED cascade are reordered: ``return_all`` adds a label
    column, and a cascade whose thresholds are still None calibrates on
    ITS OWN input at execute time — reordering would change the
    calibration distribution and thus the surviving row set (pin taus
    with CascadePrewarmOptimizer first and the node becomes
    reorderable). Estimation failures leave the original order
    (fail-open, like the other optimizers).

    ``store`` (a :class:`CalibrationStore` shared with
    ``CascadePrewarmOptimizer``, prewarm first in the chain) supplies
    selectivities recorded during τ learning, so filters the cascade
    already labeled cost ZERO additional LM calls here — one labeling
    pass feeds both optimizers.
    """

    def __init__(self, train_df: Optional[DataFrame] = None,
                 sample_rows: int = 64,
                 costs: Optional[dict[str, float]] = None,
                 store: Optional[CalibrationStore] = None):
        self.train_df = train_df
        self.sample_rows = sample_rows
        self.costs = costs or {}
        self.store = store

    def _selectivities(self, train, ops: list,
                       run: list[int]) -> dict[int, Optional[float]]:
        """Estimate every uncached filter's selectivity in ONE Spark job
        (r14): chain the filters in ``return_all`` mode over the sample
        (each LM still labels every sample row, exactly as the old
        one-job-per-filter shape did) and take all keep-counts plus the
        sample size from a single aggregate. A single job also makes the
        sample self-consistent by construction, so the separate
        persist + count pin is unnecessary. The reorder decision this
        feeds cannot change the surviving row set (conjunctions are
        order-independent) — only the LM-call count."""
        from lotus_spark.operators.sem_filter import sem_filter

        sels: dict[int, Optional[float]] = {}
        pending = []
        for k in run:
            instr = str(ops[k].args[0])
            cached = (self.store.selectivity(instr)
                      if self.store is not None else None)
            if cached is not None:
                sels[k] = cached
            else:
                pending.append(k)
        if not pending:
            return sels
        try:
            cur = train.limit(self.sample_rows)
            for k in pending:
                kw = dict(ops[k].kwargs)
                kw.pop("cascade_args", None)  # plain pass for estimation
                kw["return_all"] = True
                kw["suffix"] = f"__sel_{k}"
                cur = sem_filter(cur, ops[k].args[0], **kw)
            row = cur.agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col(f"__sel_{k}").cast("long")).alias(f"k{k}")
                  for k in pending],
            ).first()
            n = row["n"]
            for k in pending:
                if n == 0:
                    sels[k] = None
                    continue
                sel = (row[f"k{k}"] or 0) / n
                sels[k] = sel
                if self.store is not None:
                    self.store.put_selectivity(str(ops[k].args[0]), sel)
        except Exception:
            for k in pending:
                sels.setdefault(k, None)
        return sels

    def __call__(self, ops: list[OpNode], train_df: Optional[DataFrame] = None,
                 **_: Any) -> list[OpNode]:
        train = train_df if train_df is not None else self.train_df
        if train is None:
            return list(ops)

        def reorderable(node: OpNode) -> bool:
            if node.op != "sem_filter" or node.kwargs.get("return_all", False):
                return False
            cargs = node.kwargs.get("cascade_args")
            if cargs is not None and getattr(cargs, "tau_pos", None) is None:
                return False  # would recalibrate on a different input
            return True

        out: list[OpNode] = []
        i = 0
        while i < len(ops):
            if not reorderable(ops[i]):
                out.append(ops[i])
                i += 1
                continue
            j = i
            while j < len(ops) and reorderable(ops[j]):
                j += 1
            run = list(range(i, j))
            if len(run) > 1:
                sels = self._selectivities(train, ops, run)
                if all(s is not None for s in sels.values()):
                    # rank = (1 - sel) / cost, higher first; stable
                    # on ties (original position breaks them)
                    def cost(k):
                        return max(
                            self.costs.get(str(ops[k].args[0]), 1.0),
                            1e-9)

                    run = sorted(
                        run,
                        key=lambda k: (-(1.0 - sels[k]) / cost(k), k),
                    )
            out.extend(ops[k] for k in run)
            i = j
        return out
