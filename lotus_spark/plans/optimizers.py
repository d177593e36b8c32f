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
from dataclasses import replace as dc_replace
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame

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


class CascadePrewarmOptimizer:
    """Learn cascade thresholds on train data; pin them into the plan."""

    def __init__(self, train_df: Optional[DataFrame] = None):
        self.train_df = train_df

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
                learned = _learn_filter_taus(train, node)
                if learned is not None:
                    new_cargs = dc_replace(cargs, tau_pos=learned[0], tau_neg=learned[1])
                    node = replace_node_kwargs(node, cascade_args=new_cargs)
            out.append(node)
        return out


def _learn_filter_taus(train: DataFrame, node: OpNode) -> Optional[tuple[float, float]]:
    """Run the cascade's calibrate→sample→label→learn phase on train data."""
    from lotus_spark.cascades.filter_cascade import learn_taus_on

    try:
        return learn_taus_on(train, node.args[0], node.kwargs)
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
