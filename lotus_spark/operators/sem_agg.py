"""sem_agg — LLM aggregation ("semantic reduce").

Reference semantics (``lotus/sem_ops/sem_agg.py:62-235`` core, ``:238-487``
accessor): hierarchical fold — pack serialized rows into context-bounded
batches (budget = ``max_ctx_len - max_tokens``, ``sem_agg.py:187``),
summarize each batch, repeat over the summaries until one remains. Distinct
leaf vs node prompts (``:14-59``); ``group_by`` aggregates per group;
partition-aware fold ordering via ``_lotus_partition_id`` (``:432-436``);
oversized docs handled by TRUNCATE/CHUNK (``long_context_strategy.py``).

Spark design:
- grouped: ``groupBy(keys).applyInPandas(fold)`` — each group folds inside
  one task; groups run in parallel across the cluster (the reference used a
  thread pool; here it's free parallelism).
- global: a treeAggregate-shaped loop — each round packs rows per partition
  into token-budgeted batches and summarizes them with ``mapInPandas``;
  rounds repeat (shrinking partition count) until ≤1 row remains. No driver
  materialization of documents at any scale; only the final answer.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from lotus_spark.nl_expression import nle2str, parse_cols
from lotus_spark.operators import prompts
from lotus_spark.operators.sem_map import _resolve_lm
from lotus_spark.operators.sem_partition_by import PARTITION_COL
from lotus_spark.serialization import docs_from_pdf
from lotus_spark.session import settings

AGG_COL = "_output"


def _pack(docs: list[str], lm: Any, budget: int,
          strategy: str = "truncate") -> list[list[str]]:
    """Greedy packing of docs into batches whose token total fits budget.

    Oversized docs are bounded by the LongContextStrategy (SURVEY §2.6,
    ``lotus/long_context_strategy.py``): TRUNCATE cuts token-targeted with
    an ellipsis; CHUNK splits into budget-sized pieces that flow into the
    fold as additional documents (nothing is dropped).
    """
    from lotus_spark.long_context import split_tokenwise, truncate_doc

    batches: list[list[str]] = []
    cur: list[str] = []
    cur_tokens = 0
    for d in docs:
        if strategy == "chunk":
            pieces = split_tokenwise(d, lm, budget)
        else:
            pieces = [truncate_doc(d, lm, budget)]
        for piece in pieces:
            t = lm.count_tokens(piece)
            if cur and cur_tokens + t > budget:
                batches.append(cur)
                cur, cur_tokens = [], 0
            cur.append(piece)
            cur_tokens += t
    if cur:
        batches.append(cur)
    return batches


def _fold_once(docs: list[str], lm: Any, instruction: str, leaf: bool,
               strategy: str = "truncate", **kw) -> list[str]:
    budget = max(1024, lm.max_ctx_len - lm.max_tokens)
    batches = _pack(docs, lm, budget, strategy)
    fmt = prompts.agg_leaf_messages if leaf else prompts.agg_node_messages
    msgs = []
    for batch in batches:
        block = "\n".join(
            f"\tDocument {i + 1}:\n{d}" for i, d in enumerate(batch)
        )
        msgs.append(fmt(block, instruction))
    return lm(msgs, **kw).outputs


def fold_to_one(docs: list[str], lm: Any, instruction: str,
                strategy: str = "truncate", **kw) -> str:
    """Full hierarchical fold of a doc list down to a single answer."""
    if not docs:
        return ""
    level = _fold_once(docs, lm, instruction, leaf=True, strategy=strategy, **kw)
    while len(level) > 1:
        # summaries are model-bounded; truncate guards the rare overflow
        level = _fold_once(level, lm, instruction, leaf=False, **kw)
    return level[0]


def sem_agg(
    df: DataFrame,
    user_instruction: str,
    lm: Any = None,
    group_by: Optional[list[str]] = None,
    suffix: str = AGG_COL,
    long_context_strategy: str = "truncate",
    **model_kwargs: Any,
) -> DataFrame:
    if long_context_strategy not in ("truncate", "chunk"):
        raise ValueError("long_context_strategy must be 'truncate' or 'chunk'")
    model = _resolve_lm(lm)
    cols = parse_cols(user_instruction)
    all_cols = "{all}" in user_instruction or not cols
    use_cols = [c for c in df.columns if not c.startswith("_")] if all_cols else cols
    missing = [c for c in use_cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns referenced in instruction not in DataFrame: {missing}")
    instr = nle2str(user_instruction.replace("{all}", "all columns"), cols)
    fmt = settings.serialization_format
    spark = df.sparkSession

    if group_by:
        out_schema = StructType(
            [df.schema[c] for c in group_by] + [StructField(suffix, StringType())]
        )

        def fold_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
            if PARTITION_COL in pdf.columns:
                pdf = pdf.sort_values(PARTITION_COL)
            docs = docs_from_pdf(pdf, use_cols, fmt)
            answer = fold_to_one(docs, model, instr,
                                 strategy=long_context_strategy, **model_kwargs)
            return pd.DataFrame([list(key) + [answer]], columns=group_by + [suffix])

        return df.groupBy(*group_by).applyInPandas(fold_group, schema=out_schema)

    # global aggregation: per-partition fold rounds until one row remains
    if PARTITION_COL in df.columns:
        df = df.repartition(F.col(PARTITION_COL)).sortWithinPartitions(PARTITION_COL)
    work = df
    leaf = True
    schema = StructType([StructField(suffix, StringType())])
    while True:
        is_leaf = leaf

        def fold_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            docs: list[str] = []
            for pdf in it:
                if is_leaf:
                    docs.extend(docs_from_pdf(pdf, use_cols, fmt))
                else:
                    docs.extend(pdf[suffix].astype(str))
            if not docs:
                return
            outs = _fold_once(docs, model, instr, leaf=is_leaf,
                              strategy=long_context_strategy, **model_kwargs)
            while len(outs) > 1:
                outs = _fold_once(outs, model, instr, leaf=False, **model_kwargs)
            yield pd.DataFrame({suffix: outs})

        # localCheckpoint materializes the round once — the count and the next
        # round both read the checkpoint instead of re-running the LM stage
        work = work.mapInPandas(fold_partition, schema=schema).localCheckpoint()
        n = work.count()
        if n <= 1:
            return work
        # shrink towards a single partition as the data collapses
        work = work.coalesce(max(1, n // 8))
        leaf = False
