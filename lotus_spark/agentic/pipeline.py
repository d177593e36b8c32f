"""Agentic map / filter / reduce over a Corpus — Spark-native execution.

Reference semantics: ``lotus/agentic/pipeline.py:235-440`` — fold an ordered
op list over the corpus; ``map``/``filter`` run one tool-calling agent per
shard, ``reduce`` aggregates all findings in a single terminal agent; filter
verdicts default to KEEP (never silently drop); batched shards answer with a
per-unit JSON array.

Spark design (SURVEY §2.7): a shard is a *group* in
``groupBy("_shard").applyInPandas`` — each Spark task runs the full agent
loop for its shard(s), so agents execute data-local on executors with no
driver round-trips. ``reduce`` is the one deliberate driver step: per-shard
findings are tiny by construction (one text per shard). Per-unit LLM usage
travels back as ordinary columns and is summed with a native aggregate.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import pandas as pd

from pyspark.sql import functions as F

from lotus_spark.agentic.corpus import Corpus
from lotus_spark.agentic.loop import LiteLLMCompleter, run_agent
from lotus_spark.agentic.planner import (
    DEFAULT_PARALLELISM_CAP,
    FILTER,
    MAP,
    REDUCE,
    Plan,
    derive_plan,
    _fallback_instruction,
    normalize_ops,
)
from lotus_spark.agentic.tools import Tool

_SYSTEM = {
    MAP: (
        "You are one of many parallel workers processing shards of a large "
        "corpus. Handle ONLY the shard you are given; report complete, "
        "concise findings for it."
    ),
    FILTER: (
        "You are one of many parallel workers filtering shards of a large "
        "corpus. Decide keep-or-drop for each unit you are given, using "
        "tools if they help, and follow the requested output format exactly."
    ),
    REDUCE: (
        "You are the final aggregator of an agentic map-reduce. Merge the "
        "per-shard worker findings into one coherent answer: deduplicate, "
        "reconcile conflicts, and rank by importance."
    ),
}

_OUT_SCHEMA = (
    "id string, content string, metadata map<string,string>, "
    "keep boolean, prompt_tokens long, completion_tokens long"
)


@dataclass
class AgentResult:
    """Pipeline outcome: ``output`` for terminal runs, ``corpus`` otherwise."""

    ops: list[str]
    plan: Plan
    usage: dict[str, int] = field(default_factory=dict)
    output: Optional[str] = None
    corpus: Optional[Corpus] = None
    findings: Optional[list[str]] = None


def _tool_note(tools: list[Tool]) -> str:
    if not tools:
        return ""
    lines = "\n".join(f"- {t.name}: {t.description}" for t in tools)
    return (
        "\n\nYou can call these tools:\n" + lines +
        "\nPrefer tools over mental math for anything exact — counting, "
        "arithmetic, parsing."
    )


def parse_verdict(text: str) -> bool:
    """KEEP/DROP from an agent reply; ambiguous → KEEP (never silently drop)."""
    m = re.search(r"VERDICT:\s*(KEEP|DROP)", text or "", re.IGNORECASE)
    if m:
        return m.group(1).upper() == "KEEP"
    up = (text or "").upper()
    if "DROP" in up and "KEEP" not in up:
        return False
    return True


def parse_unit_array(text: str, kind: str) -> dict[str, str]:
    """Per-unit JSON array from a batched shard reply → {unit_id: result}."""
    m = re.search(r"\[[\s\S]*\]", text or "")
    if not m:
        return {}
    try:
        arr = json.loads(m.group(0))
    except (json.JSONDecodeError, ValueError):
        return {}
    out: dict[str, str] = {}
    for e in arr if isinstance(arr, list) else []:
        if not isinstance(e, dict) or e.get("id") is None:
            continue
        if kind == FILTER:
            out[str(e["id"])] = ("VERDICT: KEEP" if e.get("keep")
                                 else "VERDICT: DROP")
        else:
            out[str(e["id"])] = str(e.get("output", ""))
    return out


def _shard_prompt(kind: str, instruction: str, units: list[tuple[str, str]],
                  context: Optional[str], batched: bool) -> str:
    body = f"INSTRUCTION:\n{instruction}"
    if context:
        body += f"\n\nBACKGROUND (shared across all workers):\n{context}"
    rendered = "\n\n".join(f"[unit {uid}]\n{content}" for uid, content in units)
    body += f"\n\nYOUR SHARD:\n{rendered}"
    if batched and kind == FILTER:
        body += (
            "\n\nThe shard has MULTIPLE '[unit <id>]' entries. Decide each "
            "one separately and finish with one JSON array on its own line: "
            '[{"id": "<id>", "keep": true|false}, ...] — exactly one entry '
            "per unit."
        )
    elif batched:
        body += (
            "\n\nThe shard has MULTIPLE '[unit <id>]' entries. Produce the "
            "requested output for each and finish with one JSON array on its "
            'own line: [{"id": "<id>", "output": "<result>"}, ...] — exactly '
            "one entry per unit."
        )
    elif kind == FILTER:
        body += "\n\nFinish with a line 'VERDICT: KEEP' or 'VERDICT: DROP'."
    return body


def _run_shard_op(
    kind: str,
    instruction: str,
    context: Optional[str],
    completer_factory: Callable[[list[Tool]], Any],
    tools: list[Tool],
    max_steps: int,
    pdf: pd.DataFrame,
) -> pd.DataFrame:
    """Executor-side: one agent session per shard group → per-unit rows."""
    units = list(zip(pdf["id"].astype(str), pdf["content"].astype(str)))
    batched = len(units) > 1
    completer = completer_factory(tools)
    res = run_agent(
        completer, tools,
        system_prompt=_SYSTEM[kind] + _tool_note(tools),
        user_content=_shard_prompt(kind, instruction, units, context, batched),
        max_steps=max_steps,
    )
    if batched:
        per_unit = parse_unit_array(res.output, kind)
    else:
        per_unit = {units[0][0]: res.output}

    rows = []
    for i, (uid, content) in enumerate(units):
        # missing batched entries fall back to KEEP / the original content
        r = per_unit.get(uid, "VERDICT: KEEP" if kind == FILTER else content)
        rows.append({
            "id": uid,
            "content": r if kind == MAP else content,
            "metadata": ({"op": "map", "source_id": uid} if kind == MAP
                         else dict(pdf["metadata"].iloc[i] or {})),
            "keep": parse_verdict(r) if kind == FILTER else True,
            # shard usage attributed to its first unit row
            "prompt_tokens": int(res.usage.get("prompt_tokens", 0)) if i == 0 else 0,
            "completion_tokens": (int(res.usage.get("completion_tokens", 0))
                                  if i == 0 else 0),
        })
    return pd.DataFrame(rows)


def _corpus_op(
    corpus: Corpus,
    kind: str,
    instruction: str,
    *,
    strategy: str,
    context: Optional[str],
    completer_factory: Callable[[list[Tool]], Any],
    tools: list[Tool],
    shard_size: int,
    parallelism: int,
    max_steps: int,
    usage: dict[str, int],
) -> tuple[Corpus, Optional[list[str]]]:
    size = max(2, shard_size) if strategy == "batched" else 1
    sharded = corpus.shard(size)
    # cap concurrent agent tasks (= concurrent LLM traffic) at `parallelism`
    sharded = sharded.repartition(max(1, parallelism), "_shard")

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _run_shard_op(kind, instruction, context, completer_factory,
                          tools, max_steps, g)
            for _, g in pdf.groupby("_shard", sort=True)
        ]
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame(columns=["id", "content", "metadata", "keep",
                                           "prompt_tokens",
                                           "completion_tokens"]))

    result = (
        sharded.groupBy("_shard")
        .applyInPandas(apply_fn, schema=_OUT_SCHEMA)
        .localCheckpoint()  # run the agents exactly once
    )
    tot = result.agg(
        F.sum("prompt_tokens").alias("p"), F.sum("completion_tokens").alias("c")
    ).first()
    usage["prompt_tokens"] = usage.get("prompt_tokens", 0) + int(tot["p"] or 0)
    usage["completion_tokens"] = (usage.get("completion_tokens", 0)
                                  + int(tot["c"] or 0))

    kept = result.filter("keep").select("id", "content", "metadata")
    findings = None
    if kind == MAP:
        findings = [r["content"] for r in kept.select("content").collect()]
    return Corpus(kept), findings


def _reduce_op(
    corpus: Corpus,
    instruction: str,
    *,
    completer_factory: Callable[[list[Tool]], Any],
    tools: list[Tool],
    max_steps: int,
    usage: dict[str, int],
) -> str:
    rows = corpus.df.select("id", "content").collect()
    joined = "\n\n".join(
        f"[finding {i}]\n{r['content']}" for i, r in enumerate(rows)
    )
    completer = completer_factory(tools)
    res = run_agent(
        completer, tools,
        system_prompt=_SYSTEM[REDUCE] + _tool_note(tools),
        user_content=f"INSTRUCTION:\n{instruction}\n\nWORKER FINDINGS:\n{joined}",
        max_steps=max_steps,
    )
    for k, v in res.usage.items():
        usage[k] = usage.get(k, 0) + int(v)
    return res.output


def default_completer_factory(model: str, temperature: float = 0.0,
                              max_tokens: int = 1024,
                              api_base: Optional[str] = None):
    def factory(tools: list[Tool]):
        return LiteLLMCompleter(model, tools, temperature=temperature,
                                max_tokens=max_tokens, api_base=api_base)

    return factory


def run_pipeline(
    corpus: Corpus,
    task: str,
    *,
    ops: Any = None,
    tools: Optional[list[Tool]] = None,
    instructions: Optional[dict[str, str]] = None,
    strategies: Optional[dict[str, str]] = None,
    contexts: Optional[dict[str, str]] = None,
    plan: Any = "auto",
    max_parallelism: Any = "auto",
    max_steps: int = 6,
    lm: Any = None,
    completer_factory: Optional[Callable[[list[Tool]], Any]] = None,
) -> AgentResult:
    """Fold an ordered op pipeline (``map``/``filter``/``reduce``) over
    ``corpus`` for ``task``.

    ``completer_factory(tools) -> Completer`` is the injection point that
    makes the whole pipeline hermetic in tests; production defaults to a
    litellm completer built from ``lm`` (or ``settings.lm``) model config.
    """
    from lotus_spark.session import settings

    op_list = normalize_ops(ops)
    tools = list(tools or [])
    overrides = dict(instructions or {})
    strat_overrides = dict(strategies or {})
    ctx_overrides = dict(contexts or {})

    if completer_factory is None:
        the_lm = lm if lm is not None else settings.lm
        if the_lm is None:
            raise ValueError(
                "run_pipeline needs a completer_factory, an lm, or settings.lm"
            )
        completer_factory = default_completer_factory(
            getattr(the_lm, "model", "gpt-4o-mini"),
            temperature=getattr(the_lm, "temperature", 0.0),
            api_base=getattr(the_lm, "api_base", None),
        )

    cap = (DEFAULT_PARALLELISM_CAP if max_parallelism == "auto"
           else int(max_parallelism))
    if isinstance(plan, Plan):
        the_plan = plan
    else:
        sample = [r["content"] for r in corpus.df.select("content").limit(3).collect()]
        the_plan = derive_plan(
            task, op_list, lm=lm if lm is not None else settings.lm,
            sample_units=sample, n_units=corpus.count(), overrides=overrides,
            parallelism_cap=cap,
        )
    the_plan.ops = op_list
    the_plan.parallelism = max(1, min(the_plan.parallelism, cap))

    usage: dict[str, int] = {}
    current: Optional[Corpus] = corpus
    findings: Optional[list[str]] = None
    output: Optional[str] = None

    def instr(op: str) -> str:
        return (the_plan.instructions.get(op) or overrides.get(op)
                or _fallback_instruction(op, task))

    for op in op_list:
        assert current is not None  # terminal op is last (normalize_ops)
        if op == REDUCE:
            output = _reduce_op(
                current, instr(op), completer_factory=completer_factory,
                tools=tools, max_steps=max_steps, usage=usage,
            )
            current = None
        else:
            current, f = _corpus_op(
                current, op, instr(op),
                strategy=(strat_overrides.get(op)
                          or the_plan.strategies.get(op, "per_unit")),
                context=ctx_overrides.get(op) or the_plan.contexts.get(op),
                completer_factory=completer_factory, tools=tools,
                shard_size=the_plan.shard_size,
                parallelism=the_plan.parallelism, max_steps=max_steps,
                usage=usage,
            )
            if op == MAP:
                findings = f

    return AgentResult(ops=op_list, plan=the_plan, usage=usage, output=output,
                       corpus=current, findings=findings)
