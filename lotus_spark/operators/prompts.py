"""Prompt construction for semantic operators.

Reproduces the reference's formatters (``lotus/templates/task_instructions.py``):
- ``filter_formatter`` — claim-verification system prompt, few-shot as
  alternating user/assistant turns, configurable answer tokens (:87-165)
- ``map_formatter`` + COT / ZS-COT variants (:168-262)
- ``extract_formatter`` — JSON fields + optional quotes (:265-329)
- binary comparison prompt for top-k (``sem_topk.py:16-80``)
"""

from __future__ import annotations

from typing import Optional

Messages = list[dict]

COT_SUFFIX = (
    "\nFirst write your step-by-step reasoning prefixed with 'Reasoning:', "
    "then give the final result prefixed with 'Answer:'."
)


def filter_messages(
    doc: str,
    instruction: str,
    output_tokens: tuple[str, str] = ("True", "False"),
    examples: Optional[list[tuple[str, str, Optional[str]]]] = None,
    strategy: Optional[str] = None,
    system_prompt: Optional[str] = None,
) -> Messages:
    pos, neg = output_tokens
    sys = system_prompt or (
        "The user will provide a claim and some relevant context.\n"
        f"Your job is to determine whether the claim is true for the given context.\n"
        f'You must answer with a single word, "{pos}" or "{neg}".'
    )
    if strategy in ("cot", "zs-cot"):
        sys += COT_SUFFIX
    msgs: Messages = [{"role": "system", "content": sys}]
    for ex in examples or []:
        doc_ex, answer, reasoning = ex
        msgs.append({"role": "user", "content": f"Context:\n{doc_ex}\n\nClaim: {instruction}"})
        content = answer if not reasoning else f"Reasoning: {reasoning}\nAnswer: {answer}"
        msgs.append({"role": "assistant", "content": content})
    msgs.append({"role": "user", "content": f"Context:\n{doc}\n\nClaim: {instruction}"})
    return msgs


def map_messages(
    doc: str,
    instruction: str,
    examples: Optional[list[tuple[str, str, Optional[str]]]] = None,
    strategy: Optional[str] = None,
    system_prompt: Optional[str] = None,
) -> Messages:
    sys = system_prompt or (
        "The user will provide an instruction and some relevant context.\n"
        "Your job is to answer the user's instruction given the context."
    )
    if strategy in ("cot", "zs-cot"):
        sys += COT_SUFFIX
    msgs: Messages = [{"role": "system", "content": sys}]
    for ex in examples or []:
        doc_ex, answer, reasoning = ex
        msgs.append({"role": "user", "content": f"Context:\n{doc_ex}\n\nInstruction: {instruction}"})
        content = answer if not reasoning else f"Reasoning: {reasoning}\nAnswer: {answer}"
        msgs.append({"role": "assistant", "content": content})
    msgs.append({"role": "user", "content": f"Context:\n{doc}\n\nInstruction: {instruction}"})
    return msgs


def extract_messages(
    doc: str,
    output_cols: dict[str, Optional[str]],
    extract_quotes: bool = False,
    system_prompt: Optional[str] = None,
) -> Messages:
    fields = []
    for name, desc in output_cols.items():
        fields.append(f'"{name}"' + (f" ({desc})" if desc else ""))
        if extract_quotes:
            fields.append(f'"{name}_quote" (verbatim supporting quote for {name})')
    sys = system_prompt or (
        "The user will provide the context.\n"
        "Your job is to extract these fields from the context and return them "
        "as a flat JSON object with string values:\n" + ", ".join(fields) + "\n"
        "Answer with ONLY the JSON object."
    )
    return [
        {"role": "system", "content": sys},
        {"role": "user", "content": f"Context:\n{doc}"},
    ]


def compare_messages(doc1: str, doc2: str, instruction: str) -> Messages:
    sys = (
        "The user will provide two documents and a ranking criterion.\n"
        'Answer with exactly "Document 1" or "Document 2" — whichever better '
        "satisfies the criterion."
    )
    return [
        {"role": "system", "content": sys},
        {
            "role": "user",
            "content": (
                f"Criterion: {instruction}\n\nDocument 1:\n{doc1}\n\nDocument 2:\n{doc2}"
            ),
        },
    ]


def agg_leaf_messages(docs_block: str, instruction: str) -> Messages:
    sys = (
        "Your job is to provide an answer to the user's instruction given the "
        "context below from multiple documents.\n"
        "Remember that your job is to answer the user's instruction by "
        "combining all relevant information from all provided documents."
    )
    return [
        {"role": "system", "content": sys},
        {"role": "user", "content": f"Context:\n{docs_block}\n\nInstruction: {instruction}"},
    ]


def agg_node_messages(summaries_block: str, instruction: str) -> Messages:
    sys = (
        "Your job is to provide an answer to the user's instruction given the "
        "context below from multiple partial answers.\n"
        "Combine the partial answers into a single coherent answer."
    )
    return [
        {"role": "system", "content": sys},
        {"role": "user", "content": f"Context:\n{summaries_block}\n\nInstruction: {instruction}"},
    ]
