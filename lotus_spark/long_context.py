"""Long-context strategies — the engine's "spill" analog (SURVEY §2.6).

Reference (``lotus/long_context_strategy.py``): when a document exceeds the
per-call token budget, either
- **TRUNCATE** (:85-142): token-exact truncation + ellipsis, or
- **CHUNK** (:145-261): find the largest column, split it token-exactly into
  chunks, replicate the other columns per chunk (tracking chunk info so
  downstream partition-id restoration works).

Spark mapping: TRUNCATE is a per-row transformation inside the consuming UDF
(see ``sem_agg``); CHUNK is a real ``explode`` — one row becomes N rows with
``_chunk_id``/``_chunk_of`` bookkeeping columns, which keeps chunking fully
distributed and lets downstream grouped ops reassemble.

Token counting uses the LM's ``count_tokens`` (len//4 heuristic by default,
tokenizer-exact when a real client overrides it).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

TRUNCATE = "truncate"
CHUNK = "chunk"


def truncate_doc(doc: str, lm: Any, budget_tokens: int) -> str:
    if lm.count_tokens(doc) <= budget_tokens:
        return doc
    # chars-per-token from this doc's own density → token-targeted cut
    ratio = max(1, len(doc) // max(lm.count_tokens(doc), 1))
    return doc[: budget_tokens * ratio] + "…"


def split_tokenwise(text: str, lm: Any, budget_tokens: int) -> list[str]:
    """Split text into pieces each within the budget (word-boundary aware).

    The budget is checked on the *joined* candidate chunk (summing per-word
    counts under-measures with subword/heuristic tokenizers). Each
    ``count_tokens`` call sees at most one chunk's worth of text, so cost is
    O(doc) × O(chunk), never O(doc²). A single word longer than the budget is
    emitted as its own (overlong) chunk rather than split mid-word.
    """
    if lm.count_tokens(text) <= budget_tokens:
        return [text]
    words = text.split(" ")
    chunks: list[str] = []
    cur: list[str] = []
    for w in words:
        candidate = cur + [w]
        if cur and lm.count_tokens(" ".join(candidate)) > budget_tokens:
            chunks.append(" ".join(cur))
            cur = [w]
        else:
            cur = candidate
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def chunk_column(
    df: DataFrame,
    col: str,
    lm: Any,
    budget_tokens: int,
    chunk_id_col: str = "_chunk_id",
    chunk_of_col: str = "_chunk_of",
) -> DataFrame:
    """CHUNK strategy as a distributed explode: oversized ``col`` values are
    split token-exactly; other columns replicate per chunk."""
    other = [c for c in df.columns if c != col]
    out_schema = StructType(
        [df.schema[c] for c in other]
        + [
            StructField(col, StringType()),
            StructField(chunk_id_col, IntegerType()),
            StructField(chunk_of_col, IntegerType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                text = "" if r[col] is None else str(r[col])
                pieces = split_tokenwise(text, lm, budget_tokens)
                for i, piece in enumerate(pieces):
                    rows.append(
                        [r[c] for c in other] + [piece, i, len(pieces)]
                    )
            yield pd.DataFrame(rows, columns=other + [col, chunk_id_col, chunk_of_col])

    return df.mapInPandas(run, schema=out_schema)


def apply_long_context(
    docs: list[str], lm: Any, budget_tokens: int, strategy: str = TRUNCATE
) -> list[str]:
    """In-UDF helper: bound each doc by the budget with the chosen strategy
    (CHUNK here flattens — callers needing row replication use chunk_column)."""
    if strategy == TRUNCATE:
        return [truncate_doc(d, lm, budget_tokens) for d in docs]
    if strategy == CHUNK:
        out: list[str] = []
        for d in docs:
            out.extend(split_tokenwise(d, lm, budget_tokens))
        return out
    raise ValueError(f"unknown strategy {strategy!r}; pick 'truncate' or 'chunk'")
