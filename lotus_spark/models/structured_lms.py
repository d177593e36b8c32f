"""Deterministic fake LMs that HONOR ``response_format`` — emit JSON.

The hermetic stand-ins for a live model given a structured
``response_format`` (reference ``lotus/evals/llm_as_judge.py:16-115``,
``lotus/sem_ops/sem_agg.py:471-484``): each answer is a JSON object
computed from the serialized prompt with SQL-expressible string logic,
so the ``from_json`` field-splitting path (operators/structured.py) can
be verified against a DuckDB oracle end-to-end. New module (not
demo_lms.py) per the rotation-tail discipline: registry tail entries
import demo_lms, which must stay byte-untouched within a round.
"""
from __future__ import annotations

import json
from typing import Any, Callable

from lotus_spark.models.demo_lms import _field
from lotus_spark.models.fake_lm import FakeLM, _last_user_content
from lotus_spark.models.lm import LMOutput, Messages


class StructuredJSONLM(FakeLM):
    """Answers each prompt with ``json.dumps(fn(prompt_text,
    response_format))`` — ``fn`` sees the per-call ``response_format``
    kwarg (None when the operator didn't forward one), so tests can pin
    the forwarding itself, not just the parse."""

    def __init__(self, fn: Callable[[str, Any], dict]):
        self._dict_fn = fn
        super().__init__(lambda p: "")

    def __call__(self, batch: list[Messages], **kwargs: Any) -> LMOutput:
        rf = kwargs.get("response_format")
        prompts = [_last_user_content(m) for m in batch]
        outputs = [json.dumps(self._dict_fn(p, rf)) for p in prompts]
        self.usage.total_calls += len(batch)
        self.usage.virtual_calls += len(batch)
        return LMOutput(outputs=outputs)


class TokenCountStructuredJudge(StructuredJSONLM):
    """Structured judge fake: ``{"n_tokens": <whitespace token count of
    the serialized [col] field>, "verdict": "long" | "short"}`` with the
    threshold at ``long_at``. Oracle replica:
    ``len(string_split_regex(trim(text), '\\s+'))`` and a CASE."""

    def __init__(self, col: str = "text", long_at: int = 40):
        def fn(prompt: str, rf: Any) -> dict:
            v = _field(prompt, col) or ""
            n = len(v.split()) if v.strip() else 1
            return {"n_tokens": n,
                    "verdict": "long" if n >= long_at else "short"}

        super().__init__(fn)
        self.col = col
        self.long_at = long_at
