"""Natural-language expression templating: ``{column}`` references.

Reproduces the semantics of the reference's ``lotus/nl_expression.py:4-21``:
``parse_cols`` extracts ``{col}`` placeholders (ignoring escaped ``{{}}``),
``nle2str`` rewrites the instruction with display-cased column names.

Join instructions additionally support ``{col:left}`` / ``{col:right}``
disambiguation (reference ``lotus/sem_ops/sem_join.py:716-747``).
"""

from __future__ import annotations

import re

# {name} placeholders; name may contain spaces; ":left"/":right" suffix for joins
_PLACEHOLDER = re.compile(r"(?<!\{)\{([^{}]+)\}(?!\})")


def parse_cols(instruction: str) -> list[str]:
    """Extract referenced column names (without :left/:right suffix), in order."""
    cols: list[str] = []
    for m in _PLACEHOLDER.finditer(instruction):
        name = m.group(1)
        if name.endswith(":left") or name.endswith(":right"):
            name = name.rsplit(":", 1)[0]
        if name not in cols:
            cols.append(name)
    return cols


def parse_cols_sided(instruction: str) -> tuple[list[str], list[str], list[str]]:
    """Extract (left, right, unsided) column references for joins."""
    left: list[str] = []
    right: list[str] = []
    unsided: list[str] = []
    for m in _PLACEHOLDER.finditer(instruction):
        name = m.group(1)
        if name.endswith(":left"):
            base = name.rsplit(":", 1)[0]
            if base not in left:
                left.append(base)
        elif name.endswith(":right"):
            base = name.rsplit(":", 1)[0]
            if base not in right:
                right.append(base)
        elif name not in unsided:
            unsided.append(name)
    return left, right, unsided


def nle2str(instruction: str, cols: list[str]) -> str:
    """Rewrite ``{col}`` → display column name, like the reference's nle2str."""
    out = instruction
    for col in cols:
        out = out.replace(f"{{{col}}}", col)
        out = out.replace(f"{{{col}:left}}", col)
        out = out.replace(f"{{{col}:right}}", col)
    return out
