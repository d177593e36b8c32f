"""Deterministic demo LMs whose behavior is exactly SQL-expressible.

Each class here parses the operator's serialized prompt and computes its
answer with simple string logic, so every semantic operator's *plumbing*
(prompt build → LM batch → postprocess → DataFrame assembly) can be verified
against a DuckDB SQL oracle end-to-end. This mirrors the reference's fake
completer pattern (``tests/test_agentic_map_reduce.py``).
"""

from __future__ import annotations

import json
import re

from lotus_spark.models.fake_lm import FakeLM

_VAL = r"\[{col}\]: «(.*?)»"


def _field(prompt: str, col: str) -> str | None:
    m = re.search(_VAL.format(col=re.escape(col)), prompt, re.DOTALL)
    return m.group(1) if m else None


class JSONExtractLM(FakeLM):
    """sem_extract fake: emits {"first_word": ..., "n_tokens": ...} from the
    serialized [text] field. Oracle: split_part / len(string_split...)."""

    def __init__(self, col: str = "text"):
        def fn(prompt: str) -> str:
            v = _field(prompt, col) or ""
            toks = v.split()
            return json.dumps(
                {"first_word": toks[0] if toks else "", "n_tokens": str(len(toks))}
            )

        super().__init__(fn)


class PairKeywordJoinLM(FakeLM):
    """sem_join fake: True iff the [kw] value is a substring of the [text]
    value. Oracle: WHERE contains(text, kw)."""

    def __init__(self, text_col: str = "text", kw_col: str = "kw"):
        def fn(prompt: str) -> str:
            text = _field(prompt, text_col) or ""
            kw = _field(prompt, kw_col) or ""
            return "True" if kw and kw in text else "False"

        super().__init__(fn)


class CountingAggLM(FakeLM):
    """sem_agg fake: the hierarchical fold computes COUNT(*).

    Leaf docs (serialized rows) count 1 each; node docs (previous numeric
    answers) contribute their value — so any fold shape yields the exact
    row count. Oracle: CAST(count(*) AS VARCHAR)."""

    _DOC_SPLIT = re.compile(r"\tDocument \d+:\n")

    def __init__(self) -> None:
        def fn(prompt: str) -> str:
            ctx = prompt
            if "\n\nInstruction:" in ctx:
                ctx = ctx.split("\n\nInstruction:")[0]
            parts = self._DOC_SPLIT.split(ctx)[1:]
            total = 0
            for p in parts:
                body = p.strip()
                total += int(body) if re.fullmatch(r"\d+", body) else 1
            return str(total)

        super().__init__(fn)


class LongerFieldLM(FakeLM):
    """pairwise_judge fake: "better" = strictly longer string value, judged
    POSITIONALLY (first serialized field vs second) so the permuted trial
    genuinely swaps the comparison, like a position-biased judge would see
    it. Oracle: length(first col) > length(second col) per trial."""

    _FIELDS = re.compile(r"\[[^\]]+\]: «(.*?)»", re.DOTALL)

    def __init__(self):
        def fn(prompt: str) -> str:
            vals = self._FIELDS.findall(prompt)
            if len(vals) < 2:
                return "False"
            return "True" if len(vals[0]) > len(vals[1]) else "False"

        super().__init__(fn)


class TokenCountJudgeLM(FakeLM):
    """llm_as_judge fake: the judge's verdict is the serialized [text]
    field's whitespace token count. Oracle:
    CAST(len(string_split_regex(trim(text), '\\s+')) AS VARCHAR)."""

    def __init__(self, col: str = "text"):
        def fn(prompt: str) -> str:
            v = _field(prompt, col) or ""
            return str(len(v.split()) if v.strip() else 1)

        super().__init__(fn)


class FieldCompareLM(FakeLM):
    """sem_topk fake: Document with larger (primary, -tiebreak) key wins —
    a total order, so tournament top-K equals ORDER BY primary DESC,
    tiebreak ASC LIMIT K."""

    def __init__(self, primary: str = "n_chars", tiebreak: str = "doc_id"):
        rx = re.compile(r"Document 1:\n(.*?)\n\nDocument 2:\n(.*)", re.DOTALL)

        def fn(prompt: str) -> str:
            m = rx.search(prompt)
            if not m:
                return "Document 1"
            d1, d2 = m.group(1), m.group(2)
            k1 = (float(_field(d1, primary) or 0), -float(_field(d1, tiebreak) or 0))
            k2 = (float(_field(d2, primary) or 0), -float(_field(d2, tiebreak) or 0))
            return "Document 1" if k1 > k2 else "Document 2"

        super().__init__(fn)


class TieredEvidenceRM:
    """Join-cascade proxy RM with a DESIGNED similarity ordering (the RM
    analogue of the fake LMs above, built for driver-hashable cascade
    ROUTING): a string equal to the keyword embeds as the keyword axis
    [1, 0]; any other string (a document) embeds as the L2-normalized
    evidence vector [a, 1] with

        a = 4.0  if kw in s and co_word in s      (strong evidence)
            1.0  if kw in s or decoy in s          (weak evidence)
            0.0  otherwise                         (no evidence)

    so cosine(document, keyword) takes exactly three values
    {4/sqrt(17) = 0.9701, 1/sqrt(2) = 0.7071, 0.0}: a pure-true strong
    tier, a MIXED weak tier (kw-without-co-word is true, decoy-without-kw
    is false), and a pure-false none tier. A cascade learned on these
    scores provably accepts the strong tier, routes the weak tier through
    the oracle, and rejects the none tier (given achievable targets and
    enough labeled mass per tier) — making accept/gray/reject routing a
    deterministic function of three contains() predicates that DuckDB can
    replay. Reference plan semantics: lotus/sem_ops/sem_join.py:376-421."""

    def __init__(self, kw: str, co_word: str, decoy: str):
        self.kw, self.co_word, self.decoy = kw, co_word, decoy

    def __call__(self, docs):
        import numpy as np

        out = np.zeros((len(docs), 2), dtype=np.float64)
        for i, doc in enumerate(docs):
            s = str(doc) if doc is not None else ""
            if s == self.kw:
                out[i] = (1.0, 0.0)
                continue
            if self.kw in s and self.co_word in s:
                a = 4.0
            elif self.kw in s or self.decoy in s:
                a = 1.0
            else:
                a = 0.0
            n = (a * a + 1.0) ** 0.5
            out[i] = (a / n, 1.0 / n)
        return out


class PolyHashRM:
    """SQL-expressible demo RM: component j of a doc's embedding is
    ``float32(((a_j·H + b_j) mod M) / M)`` where H is the polynomial char
    fold (``functions.text.shingle_hash``) of the doc and (a_j, b_j) the
    affine family of ``functions.dedup._hash_params``. Every value is exact
    integer math + one double divide + one float32 round — bit-replicable
    in DuckDB, so index/search pipelines built on it hash-match end to end
    (the RM analogue of the SQL-expressible fake LMs above; reference test
    pattern ``lotus/tests``)."""

    def __init__(self, dim: int = 4):
        self.dim = dim

    def __call__(self, docs):
        import numpy as np

        from lotus_spark.functions.dedup import _hash_params
        from lotus_spark.functions.text import BASE, MOD

        out = np.zeros((len(docs), self.dim), dtype=np.float32)
        for i, doc in enumerate(docs):
            h = 0
            for ch in str(doc):
                h = (h * BASE + ord(ch)) % MOD
            for j in range(self.dim):
                a, b = _hash_params(j + 1)
                out[i, j] = np.float32(((a * h + b) % MOD) / MOD)
        return out
