"""Pipeline planner: derive per-op instructions + sharding from the task.

Reference semantics: ``lotus/agentic/planner.py:121-194`` — an LM drafts one
instruction per op plus a strategy (``per_unit`` / ``batched`` /
``shared_context``), shard size, and parallelism (capped at 8), with a
deterministic heuristic fallback when no LM is configured or the draft fails.

Spark note: "parallelism" here caps the number of *shards* (= Spark
partition groups running agents); actual task parallelism is shards ×
cluster slots, so the cap bounds concurrent LLM traffic, not CPU.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

MAP, FILTER, REDUCE = "map", "filter", "reduce"
OPS = (MAP, FILTER, REDUCE)
TERMINAL_OPS = (REDUCE,)
DEFAULT_OPS = (MAP, REDUCE)
STRATEGIES = ("per_unit", "batched", "shared_context")
DEFAULT_PARALLELISM_CAP = 8


def normalize_ops(ops: Any) -> list[str]:
    """Validate an ops argument into an ordered op-name list.

    Accepts ``None`` (→ ``["map", "reduce"]``), one op string, or a sequence.
    Rejects unknown ops, duplicates, empties, and a terminal op that is not
    last (``lotus/agentic/ops.py:33-55`` semantics).
    """
    if ops is None:
        return list(DEFAULT_OPS)
    if isinstance(ops, str):
        ops = [ops]
    out: list[str] = []
    for op in ops:
        if not isinstance(op, str):
            raise TypeError(f"op names must be strings, got {op!r}")
        key = op.strip().lower()
        if key not in OPS:
            raise ValueError(f"unknown op {op!r} (valid: {', '.join(OPS)})")
        out.append(key)
    if not out:
        raise ValueError("ops must be non-empty")
    if len(set(out)) != len(out):
        raise ValueError(f"duplicate ops: {out}")
    for i, op in enumerate(out):
        if op in TERMINAL_OPS and i != len(out) - 1:
            raise ValueError(f"terminal op {op!r} must be last: {out}")
    return out


@dataclass
class Plan:
    ops: list[str]
    instructions: dict[str, str]
    strategies: dict[str, str] = field(default_factory=dict)
    contexts: dict[str, str] = field(default_factory=dict)
    shard_size: int = 1
    parallelism: int = 4


def _fallback_instruction(op: str, task: str) -> str:
    if op == MAP:
        return f"Work through your shard and complete this task on it: {task}"
    if op == FILTER:
        return f"Judge whether each unit is relevant to this task: {task}"
    if op == REDUCE:
        return (
            "Merge the per-shard findings into one coherent final answer "
            f"for this task: {task}"
        )
    return task


def heuristic_plan(task: str, ops: Sequence[str],
                   overrides: Optional[dict[str, str]] = None,
                   cap: int = DEFAULT_PARALLELISM_CAP) -> Plan:
    overrides = overrides or {}
    return Plan(
        ops=list(ops),
        instructions={
            op: overrides.get(op) or _fallback_instruction(op, task)
            for op in ops
        },
        shard_size=1,
        parallelism=min(4, cap),
    )


_PLAN_PROMPT = """You are planning an agentic {ops} pipeline over a corpus.

TASK:
{task}

CORPUS: {stats}
SAMPLE UNITS:
{sample}

Reply with ONLY a JSON object:
{{{fields}, "shard_size": <int>=1>, "parallelism": <1..{cap}>}}
Strategies: per_unit (isolated), batched (several units per agent),
shared_context (per-unit plus a shared background note in "context")."""


def derive_plan(
    task: str,
    ops: Optional[Sequence[str]] = None,
    *,
    lm: Any = None,
    sample_units: Optional[list[str]] = None,
    n_units: int = 0,
    overrides: Optional[dict[str, str]] = None,
    parallelism_cap: int = DEFAULT_PARALLELISM_CAP,
) -> Plan:
    """LM-drafted plan with heuristic fallback; overrides always win."""
    op_list = normalize_ops(list(ops) if ops is not None else None)
    overrides = dict(overrides or {})
    plan = heuristic_plan(task, op_list, overrides, parallelism_cap)
    if lm is None or all(op in overrides for op in op_list):
        return plan

    fields = ", ".join(
        f'"{op}_instruction": <str>, "{op}_strategy": <str>' for op in op_list
    )
    sample = "\n---\n".join((s or "")[:400] for s in (sample_units or [])[:3])
    lengths = [len(s or "") for s in (sample_units or [])] or [0]
    stats = (f"{n_units} units; sampled content length "
             f"min={min(lengths)} max={max(lengths)} chars")
    prompt = _PLAN_PROMPT.format(ops="/".join(op_list), task=task, stats=stats,
                                 sample=sample, fields=fields,
                                 cap=parallelism_cap)
    try:
        out = lm([[{"role": "user", "content": prompt}]]).outputs[0]
        m = re.search(r"\{[\s\S]*\}", out or "")
        draft = json.loads(m.group(0)) if m else {}
        for op in op_list:
            instr = draft.get(f"{op}_instruction")
            if instr and op not in overrides:
                plan.instructions[op] = str(instr)
            strat = str(draft.get(f"{op}_strategy", "")).strip().lower()
            if strat in STRATEGIES:
                plan.strategies[op] = strat
            ctx = draft.get(f"{op}_context") or draft.get("context")
            if ctx:
                plan.contexts[op] = str(ctx)
        plan.shard_size = max(1, int(draft.get("shard_size", plan.shard_size)))
        plan.parallelism = max(
            1, min(int(draft.get("parallelism", plan.parallelism)),
                   parallelism_cap)
        )
    except Exception:
        pass  # planning is best-effort; the heuristic plan stands
    return plan
