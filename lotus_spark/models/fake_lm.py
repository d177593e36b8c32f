"""Deterministic fake LMs for hermetic tests and the DuckDB correctness gate.

The reference proves this pattern with injected fake completers in
``tests/test_agentic_map_reduce.py`` (``lotus/agentic/pipeline.py:13-15``):
semantic-operator *plumbing* (prompt build, routing, cascade math, output
assembly) is tested with scripted answers, no network.

These fakes answer from the prompt text itself, so a ``sem_filter`` with a
``KeywordBoolLM`` is exactly equivalent to a SQL ``LIKE`` predicate — which is
what lets the driver's DuckDB oracle hash-check the semantic operator path.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Optional

from lotus_spark.models.lm import LM, LMOutput, Messages


def _last_user_content(messages: Messages) -> str:
    for m in reversed(messages):
        if m.get("role") == "user":
            c = m.get("content")
            if isinstance(c, list):  # multimodal content blocks
                return " ".join(
                    b.get("text", "") for b in c if isinstance(b, dict)
                )
            return str(c)
    return ""


class FakeLM(LM):
    """Answers each prompt via a user-supplied ``fn(prompt_text) -> str``."""

    model = "fake"

    def __init__(self, fn: Callable[[str], str], logprob_fn: Optional[Callable[[str], dict[str, float]]] = None):
        super().__init__()
        self.fn = fn
        self.logprob_fn = logprob_fn

    def __call__(self, batch: list[Messages], **kwargs: Any) -> LMOutput:
        prompts = [_last_user_content(m) for m in batch]
        outputs = [self.fn(p) for p in prompts]
        logprobs = [self.logprob_fn(p) for p in prompts] if self.logprob_fn else None
        self.usage.total_calls += len(batch)
        self.usage.virtual_calls += len(batch)
        return LMOutput(outputs=outputs, logprobs=logprobs)


class KeywordBoolLM(FakeLM):
    """True iff ``keyword`` appears (case-insensitive) in the serialized doc.

    Deterministic stand-in for an NL predicate; SQL-oracle equivalent:
    ``WHERE lower(col) LIKE '%keyword%'``.
    """

    def __init__(self, keyword: str, confidence: float = 0.9):
        kw = keyword.lower()

        def fn(prompt: str) -> str:
            return "True" if kw in prompt.lower() else "False"

        def logprob_fn(prompt: str) -> dict[str, float]:
            # well-calibrated fake confidence for cascade tests
            pos = confidence if kw in prompt.lower() else 1.0 - confidence
            pos = min(max(pos, 1e-6), 1 - 1e-6)
            return {"True": math.log(pos), "False": math.log(1.0 - pos)}

        super().__init__(fn, logprob_fn)
        self.keyword = keyword


class ScriptedLM(FakeLM):
    """Answers by first matching substring rule, else ``default``.

    rules: list of (substring, answer) checked in order against the prompt.
    """

    def __init__(self, rules: list[tuple[str, str]], default: str = ""):
        def fn(prompt: str) -> str:
            low = prompt.lower()
            for needle, answer in rules:
                if needle.lower() in low:
                    return answer
            return default

        super().__init__(fn)
        self.rules = rules
        self.default = default


class EchoLM(FakeLM):
    """Echoes the serialized document back (identity map)."""

    def __init__(self) -> None:
        super().__init__(lambda p: p)


class RegexMapLM(FakeLM):
    """Extracts the first regex group from the prompt and applies ``transform``.

    e.g. ``RegexMapLM(r"«(\\w+)", "upper")`` → first word of the first
    serialized value, uppercased. SQL-oracle equivalent: ``upper(split_part(...))``.
    """

    _TRANSFORMS = {
        "upper": str.upper,
        "lower": str.lower,
        "identity": lambda s: s,
    }

    def __init__(self, pattern: str, transform: str = "identity", default: str = ""):
        rx = re.compile(pattern, re.DOTALL)
        tf = self._TRANSFORMS[transform]

        def fn(prompt: str) -> str:
            m = rx.search(prompt)
            return tf(m.group(1)) if m else default

        super().__init__(fn)
        self.pattern = pattern
        self.transform = transform
