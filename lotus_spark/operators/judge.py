"""LLM-as-judge evaluation operators.

- ``llm_as_judge`` (reference ``lotus/evals/llm_as_judge.py:16-115``):
  row-wise judge = multi-trial sem_map with an evaluator system prompt;
  ``n_trials`` independent trials (cache disabled during trials), outputs
  ``{suffix}_{trial}`` columns. Structured ``response_format`` (reference
  ``:16-115`` structured scores): forwarded to each trial's LM calls;
  each trial's JSON answer splits into typed per-field columns named
  ``{field}{suffix}_{trial}`` via ``from_json`` (the reference's
  ``model_validate_json`` per raw output, as Catalyst expressions). CoT
  strategies are rejected with it (``:92-95``) — add a reasoning field
  to the response format instead.
- ``pairwise_judge`` (reference ``lotus/evals/pairwise_judge.py:27-251``):
  A-vs-B comparison = sem_filter with the instruction
  "{A} is better than {B} given the criteria: ..."; ``permute_cols`` runs a
  swapped second trial to cancel position bias (``:119-130``).

Spark design: each trial is one Arrow-batched map/filter stage; trials are
independent columns so the plan stays a single pass over the data per trial.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame

from lotus_spark.operators.sem_filter import sem_filter
from lotus_spark.operators.sem_map import sem_map

JUDGE_SYSTEM_PROMPT = (
    "You are an impartial evaluator. The user will provide evaluation "
    "criteria and some relevant context. Judge the context against the "
    "criteria and answer concisely."
)


def llm_as_judge(
    df: DataFrame,
    user_instruction: str,
    lm: Any = None,
    n_trials: int = 1,
    suffix: str = "_judge",
    system_prompt: Optional[str] = None,
    response_format: Any = None,
    split_fields_into_cols: bool = True,
    **model_kwargs: Any,
) -> DataFrame:
    out = df
    for t in range(n_trials):
        trial_suffix = f"{suffix}_{t}" if n_trials > 1 else suffix
        out = sem_map(
            out,
            user_instruction,
            lm=lm,
            suffix=trial_suffix,
            system_prompt=system_prompt or JUDGE_SYSTEM_PROMPT,
            response_format=response_format,
            # the per-trial split below suffixes the field names; a
            # plain sem_map split would collide across trials
            split_fields_into_cols=False,
            **model_kwargs,
        )
        if response_format is not None and split_fields_into_cols:
            from lotus_spark.operators.structured import split_fields

            out = split_fields(out, trial_suffix, response_format,
                               "llm_as_judge", field_suffix=trial_suffix)
    return out


def pairwise_judge(
    df: DataFrame,
    col_a: str,
    col_b: str,
    criteria: str,
    lm: Any = None,
    permute_cols: bool = False,
    suffix: str = "_pairwise",
    **model_kwargs: Any,
) -> DataFrame:
    """Adds boolean column(s): True iff ``col_a`` is judged better than
    ``col_b``. With ``permute_cols`` a swapped trial is added as
    ``{suffix}_swapped`` (True iff B better than A in swapped position)."""
    instruction = (
        f"{{{col_a}}} is better than {{{col_b}}} given the criteria: {criteria}"
    )
    out = sem_filter(
        df, instruction, lm=lm, return_all=True, suffix=suffix, **model_kwargs
    )
    if permute_cols:
        swapped = (
            f"{{{col_b}}} is better than {{{col_a}}} given the criteria: {criteria}"
        )
        out = sem_filter(
            out, swapped, lm=lm, return_all=True, suffix=f"{suffix}_swapped",
            **model_kwargs,
        )
    return out
