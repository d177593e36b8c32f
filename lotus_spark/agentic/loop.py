"""The per-shard tool-calling agent loop.

Reference semantics: ``lotus/agentic/loop.py:58-122`` — a conversation with a
``Completer``; each turn either yields a final text answer or tool calls,
whose results are fed back; after ``max_steps`` budget a forced tool-free
turn extracts a final answer.

Spark constraint: this loop executes **inside** ``applyInPandas`` on
executors, so everything here is plain picklable Python. Completers follow a
tiny protocol (``__call__(messages, tools_enabled) -> AgentStep``) so tests
inject scripted ones (no network) and production uses a lazily-imported
litellm client.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from lotus_spark.agentic.tools import Tool


@dataclass
class ToolCall:
    id: str
    name: str
    arguments: dict[str, Any]


@dataclass
class AgentStep:
    """One model turn: final ``content`` XOR a list of ``tool_calls``."""

    content: Optional[str] = None
    tool_calls: list[ToolCall] = field(default_factory=list)
    usage: dict[str, int] = field(default_factory=dict)


@dataclass
class AgentRun:
    output: str
    trace: list[dict[str, Any]]
    steps: int
    truncated: bool
    usage: dict[str, int]


def _merge_usage(into: dict[str, int], other: dict[str, int]) -> None:
    for k, v in (other or {}).items():
        into[k] = into.get(k, 0) + int(v)


def run_agent(
    completer: Callable[..., AgentStep],
    tools: list[Tool],
    system_prompt: str,
    user_content: str,
    max_steps: int = 6,
) -> AgentRun:
    """Drive one agent session to a final text answer."""
    by_name = {t.name: t for t in tools}
    messages: list[dict[str, Any]] = [
        {"role": "system", "content": system_prompt},
        {"role": "user", "content": user_content},
    ]
    trace: list[dict[str, Any]] = []
    usage: dict[str, int] = {}

    for i in range(max_steps):
        step = completer(messages)
        _merge_usage(usage, step.usage)
        if not step.tool_calls:
            return AgentRun(step.content or "", trace, i + 1, False, usage)

        messages.append({
            "role": "assistant",
            "content": step.content or "",
            "tool_calls": [
                {
                    "id": tc.id,
                    "type": "function",
                    "function": {"name": tc.name,
                                 "arguments": json.dumps(tc.arguments)},
                }
                for tc in step.tool_calls
            ],
        })
        for tc in step.tool_calls:
            t = by_name.get(tc.name)
            if t is None:
                result = f"ERROR: no such tool {tc.name!r}"
            else:
                try:
                    result = t.run(**tc.arguments)
                except Exception as e:  # feed failures back, never crash the task
                    result = f"ERROR: {type(e).__name__}: {e}"
            trace.append({"tool": tc.name, "arguments": tc.arguments,
                          "result": result})
            messages.append({"role": "tool", "tool_call_id": tc.id,
                             "name": tc.name, "content": str(result)})

    # Step budget spent: force a tool-free closing turn so we always return text.
    final = completer(
        messages + [{"role": "user",
                     "content": "Answer now with your final result only."}],
        tools_enabled=False,
    )
    _merge_usage(usage, final.usage)
    return AgentRun(final.content or "", trace, max_steps, True, usage)


class ScriptedCompleter:
    """Hermetic completer: answers from a ``fn(messages) -> AgentStep | str``.

    A plain-string return is wrapped as a final (tool-free) AgentStep. Tracks
    call count. Picklable as long as ``fn`` is a module-level function or a
    picklable callable object.
    """

    def __init__(self, fn: Callable[[list[dict[str, Any]]], Any]):
        self.fn = fn
        self.calls = 0

    def __call__(self, messages: list[dict[str, Any]], *,
                 tools_enabled: bool = True) -> AgentStep:
        self.calls += 1
        out = self.fn(messages)
        if isinstance(out, AgentStep):
            if not tools_enabled and out.tool_calls:
                return AgentStep(content=out.content or "")
            return out
        return AgentStep(content=str(out))


class LiteLLMCompleter:
    """Production completer: native litellm tool-calling (lazy import).

    Pickles as pure config; the litellm module loads on first call inside the
    executor process.
    """

    def __init__(self, model: str, tools: Optional[list[Tool]] = None,
                 temperature: float = 0.0, max_tokens: int = 1024,
                 api_base: Optional[str] = None):
        self.model = model
        self.tool_schemas = [t.schema() for t in (tools or [])] or None
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.api_base = api_base

    def __call__(self, messages: list[dict[str, Any]], *,
                 tools_enabled: bool = True) -> AgentStep:
        try:
            import litellm  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "litellm is not installed; inject a ScriptedCompleter for "
                "hermetic runs"
            ) from e
        kwargs: dict[str, Any] = {
            "temperature": self.temperature,
            "max_tokens": self.max_tokens,
        }
        if self.api_base:
            kwargs["api_base"] = self.api_base
        if self.tool_schemas and tools_enabled:
            kwargs["tools"] = self.tool_schemas
            kwargs["tool_choice"] = "auto"
        resp = litellm.completion(model=self.model, messages=messages,
                                  drop_params=True, **kwargs)
        msg = resp.choices[0].message
        calls = []
        for tc in getattr(msg, "tool_calls", None) or []:
            try:
                args = json.loads(tc.function.arguments or "{}")
            except json.JSONDecodeError:
                args = {}
            calls.append(ToolCall(id=tc.id, name=tc.function.name,
                                  arguments=args))
        usage = {}
        if getattr(resp, "usage", None) is not None:
            usage = {
                "prompt_tokens": int(resp.usage.prompt_tokens or 0),
                "completion_tokens": int(resp.usage.completion_tokens or 0),
            }
        return AgentStep(content=msg.content, tool_calls=calls, usage=usage)
