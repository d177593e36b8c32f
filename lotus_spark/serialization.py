"""Row → document serialization for LLM prompts.

Reproduces the reference's three row serializations
(``lotus/templates/task_instructions.py:333-369``):

- DEFAULT: ``[Col]: «value»\\n`` per referenced column
- JSON:    one JSON object per row
- XML:     ``<col>value</col>`` elements

These run *inside* Arrow-batched pandas UDFs — the Spark plan ships only the
referenced columns (column pruning), and the text block is built per row in
Python from the Arrow batch.
"""

from __future__ import annotations

import json
from typing import Iterable

import pandas as pd


def serialize_row(row: dict, cols: list[str], fmt: str = "default") -> str:
    if fmt == "json":
        return json.dumps({c: _coerce(row[c]) for c in cols}, ensure_ascii=False)
    if fmt == "xml":
        return "".join(f"<{c}>{_text(row[c])}</{c}>\n" for c in cols)
    # default: [Col]: «value»
    return "".join(f"[{c}]: «{_text(row[c])}»\n" for c in cols)


def serialize_batch(pdf: pd.DataFrame, cols: list[str], fmt: str = "default") -> pd.Series:
    """Vectorized-ish serialization of an Arrow batch to doc strings."""
    if fmt == "default" and len(cols) == 1:
        c = cols[0]
        return "[" + c + "]: «" + pdf[c].astype(str) + "»\n"
    return pd.Series(
        [serialize_row(row, cols, fmt) for row in pdf[cols].to_dict("records")],
        index=pdf.index,
        dtype="object",
    )


def _text(v) -> str:
    if v is None:
        return ""
    return str(v)


def _coerce(v):
    if v is None or isinstance(v, (str, int, float, bool)):
        return v
    return str(v)


def docs_from_pdf(pdf: pd.DataFrame, cols: list[str], fmt: str = "default") -> list[str]:
    return list(serialize_batch(pdf, cols, fmt))
