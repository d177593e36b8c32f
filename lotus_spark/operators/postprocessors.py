"""Output postprocessing shared by semantic operators.

Reproduces the reference's postprocessors (``lotus/sem_ops/postprocessors.py``):
- CoT ``Reasoning:`` / ``Answer:`` splitting (:12-43), incl. ``<think>`` tags (:46-120)
- filter True/False token matching with ``default`` fallback (:182-221)
- extract JSON parse with ``{}`` fallback and str-coercion (:149-179)
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Optional


@dataclass
class MapOut:
    answer: str
    explanation: Optional[str] = None


_THINK = re.compile(r"<think>(.*?)</think>", re.DOTALL)


def split_cot(output: str) -> MapOut:
    """Split 'Reasoning: ... Answer: ...' (or <think>) into (answer, explanation)."""
    if output is None:
        return MapOut(answer="", explanation=None)
    m = _THINK.search(output)
    if m:
        reasoning = m.group(1).strip()
        answer = _THINK.sub("", output).strip()
        return MapOut(answer=answer, explanation=reasoning)
    low = output.lower()
    idx = low.rfind("answer:")
    if idx >= 0:
        reasoning = output[:idx]
        ridx = reasoning.lower().find("reasoning:")
        if ridx >= 0:
            reasoning = reasoning[ridx + len("reasoning:"):]
        return MapOut(answer=output[idx + len("answer:"):].strip(),
                      explanation=reasoning.strip())
    return MapOut(answer=output.strip(), explanation=None)


def parse_bool(
    output: str,
    default: bool = True,
    output_tokens: tuple[str, str] = ("True", "False"),
) -> bool:
    """Match the positive/negative token in the answer; fallback to default.

    Mirrors reference behavior: look for the tokens anywhere in the (CoT-split)
    answer, preferring the later occurrence wins semantics of exact matching —
    here: exact match first, then substring containment, then default.
    """
    if output is None:
        return default
    ans = split_cot(output).answer.strip()
    pos, neg = output_tokens
    if ans == pos:
        return True
    if ans == neg:
        return False
    low, lpos, lneg = ans.lower(), pos.lower(), neg.lower()
    if low == lpos:
        return True
    if low == lneg:
        return False
    has_pos, has_neg = lpos in low, lneg in low
    if has_pos and not has_neg:
        return True
    if has_neg and not has_pos:
        return False
    return default


def parse_json_fields(output: str, fields: list[str]) -> dict[str, Optional[str]]:
    """Parse a JSON object out of the LLM output; coerce values to str."""
    obj = {}
    if output:
        text = output.strip()
        if text.startswith("```"):
            text = re.sub(r"^```[a-zA-Z]*\n?", "", text)
            text = re.sub(r"\n?```$", "", text)
        try:
            obj = json.loads(text)
        except (json.JSONDecodeError, ValueError):
            m = re.search(r"\{.*\}", text, re.DOTALL)
            if m:
                try:
                    obj = json.loads(m.group(0))
                except (json.JSONDecodeError, ValueError):
                    obj = {}
    if not isinstance(obj, dict):
        obj = {}
    out: dict[str, Optional[str]] = {}
    for f in fields:
        v = obj.get(f)
        out[f] = None if v is None else (v if isinstance(v, str) else json.dumps(v))
    return out
