"""Agent tools: a picklable callable + JSON-schema description.

Reference semantics: ``lotus/tools/base.py:29-100`` (Tool base + ``@tool``
decorator with auto-schema) and ``lotus/tools/repl.py:53-144`` (sandboxed
Python REPL). Spark constraint: tools ship driver→executor inside the
``applyInPandas`` closure, so they must be pure config (picklable) and any
process they spawn must be executor-local — a subprocess sandbox, never a
container-per-task.
"""

from __future__ import annotations

import inspect
import subprocess
import sys
import tempfile
from pathlib import Path
from typing import Any, Callable, Optional

_PY_TO_JSON = {int: "integer", float: "number", bool: "boolean", str: "string"}


class Tool:
    """A named callable an agent may invoke.

    Subclasses set ``name``/``description``/``parameters`` (an OpenAI-style
    JSON schema ``{"type": "object", "properties": {...}, "required": [...]}``)
    and implement ``run(**kwargs) -> str``.
    """

    name: str = ""
    description: str = ""
    parameters: dict[str, Any] = {"type": "object", "properties": {}}

    def run(self, **kwargs: Any) -> str:
        raise NotImplementedError

    def schema(self) -> dict[str, Any]:
        """OpenAI/litellm function-tool schema."""
        if not self.name:
            raise ValueError("Tool requires a non-empty name")
        return {
            "type": "function",
            "function": {
                "name": self.name,
                "description": self.description,
                "parameters": self.parameters,
            },
        }

    def __repr__(self) -> str:  # pragma: no cover
        return f"Tool({self.name!r})"


class _FnTool(Tool):
    def __init__(self, fn: Callable[..., Any], name: str, description: str,
                 parameters: dict[str, Any]):
        self._fn = fn
        self.name = name
        self.description = description
        self.parameters = parameters

    def run(self, **kwargs: Any) -> str:
        out = self._fn(**kwargs)
        return out if isinstance(out, str) else str(out)


def _schema_from_signature(fn: Callable[..., Any]) -> dict[str, Any]:
    props: dict[str, Any] = {}
    required: list[str] = []
    for pname, p in inspect.signature(fn).parameters.items():
        if pname == "self" or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        ann = p.annotation if p.annotation is not inspect.Parameter.empty else str
        props[pname] = {"type": _PY_TO_JSON.get(ann, "string")}
        if p.default is inspect.Parameter.empty:
            required.append(pname)
    schema: dict[str, Any] = {"type": "object", "properties": props}
    if required:
        schema["required"] = required
    return schema


def tool(fn: Optional[Callable[..., Any]] = None, *,
         name: Optional[str] = None, description: Optional[str] = None):
    """Decorator: plain function → :class:`Tool` with an inferred schema."""

    def wrap(func: Callable[..., Any]) -> _FnTool:
        return _FnTool(
            func,
            name or func.__name__,
            description or (inspect.getdoc(func) or "").strip(),
            _schema_from_signature(func),
        )

    return wrap(fn) if fn is not None else wrap


class PythonREPLTool(Tool):
    """Execute Python in an executor-local subprocess sandbox.

    Each call runs in a fresh temp dir with captured stdout/stderr and a wall
    timeout — stateless between calls (matches ``lotus/tools/repl.py``'s
    LocalSandbox contract). Holds only config, so it pickles cleanly into
    Spark task closures; the subprocess is spawned where the agent runs.
    """

    name = "python_repl"
    description = (
        "Run Python code in an isolated subprocess; stdout/stderr are "
        "returned. print() anything you need back. No state persists "
        "between calls."
    )
    parameters = {
        "type": "object",
        "properties": {
            "code": {
                "type": "string",
                "description": "Python source to execute; print() results.",
            }
        },
        "required": ["code"],
    }

    def __init__(self, timeout: int = 30):
        self.timeout = timeout

    def run(self, code: str) -> str:  # type: ignore[override]
        with tempfile.TemporaryDirectory(prefix="lotus_spark_repl_") as wd:
            script = Path(wd) / "cell.py"
            script.write_text(code)
            try:
                proc = subprocess.run(
                    [sys.executable, str(script)],
                    cwd=wd,
                    capture_output=True,
                    text=True,
                    timeout=self.timeout,
                )
            except subprocess.TimeoutExpired:
                return f"ERROR: timed out after {self.timeout}s"
        chunks = []
        if proc.stdout:
            chunks.append(proc.stdout.rstrip())
        if proc.stderr:
            chunks.append("[stderr]\n" + proc.stderr.rstrip())
        if proc.returncode != 0 and not proc.stderr:
            chunks.append(f"[exit {proc.returncode}]")
        return "\n".join(chunks) or "(no output)"
