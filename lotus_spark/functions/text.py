"""Text-analysis functions for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — language ID,
quality scoring, token counting, document fingerprinting. Each has an exact
ANSI-SQL equivalent (DuckDB oracle) because the math is defined as explicit
integer/double folds, not library calls.

These extend the reference's surface (which has no text-stats operators) with
the standard pretraining-corpus pipeline stages (Gopher/C4-style quality
heuristics, deterministic fingerprints for dedup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
BASE = 31

# tiny per-language marker lexicons for the n-gram-free language-ID heuristic;
# deterministic and SQL-expressible (argmax with alphabetical tie-break).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        _count_in(toks, STOPWORDS).cast("double") / n.cast("double")
    )


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ascii letters."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        alpha.cast("double") / n.cast("double")
    )


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        total.cast("double") / n.cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: Gopher-ish mix of
    stopword presence, alphabetic density, and sane mean token length."""
    sw = stopword_ratio(text)
    al = alpha_ratio(text)
    atl = avg_token_len(text)
    len_ok = F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.4 * F.least(sw * 5.0, F.lit(1.0)) + 0.4 * al + 0.2 * len_ok, 4)


def lang_id(text: Column) -> Column:
    """Marker-lexicon language guess; argmax with alphabetical tie-break,
    'und' when no marker hits."""
    toks = tokens(text)
    scores = {lang: _count_in(toks, words) for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # alphabetical tie-break: first lang (in sorted order) achieving the max wins
    for lang in sorted(LANG_MARKERS, reverse=True):
        result = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            result
        )
    return result


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over character codes, mod 1e9+7.

    fp = fold(codes, 0, (acc, c) -> (acc*31 + c) mod p). Deterministic,
    SQL-expressible, and cheap — the exact-dedup / doc-identity key for
    100 TB corpora (content-addressed, no Python in the loop).
    """
    codes = F.transform(F.split(text, ""), F.ascii)
    return F.when(F.length(text) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, c: (acc * BASE + c.cast("long")) % MOD,
        )
    )


# PII patterns — restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs, `-` at class
# edges. Counts, not redaction, so downstream policy stays composable.
PII_PATTERNS: dict[str, str] = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4s": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phones": r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}",
}


def pii_count(text: Column, kind: str) -> Column:
    """Number of matches of one PII pattern (``emails``/``ipv4s``/``phones``)."""
    return F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), 0))


def pii_redact(text: Column, replacement: str = "[PII]") -> Column:
    """All PII patterns replaced — the scrub stage of a training-data
    pipeline (JVM-side regexp_replace chain, no Python)."""
    out = text
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, replacement)
    return out


def word_ngrams(text: Column, n: int = 2) -> Column:
    """All word n-grams (non-distinct, space-joined) — the multiset
    repetition metrics need, unlike ``word_shingles`` (distinct)."""
    toks = tokens(text)
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    # n O(1) gets per gram (not an O(n) slice copy); F.get returns NULL
    # past the end (short docs) and concat_ws skips NULLs, so a doc with
    # < n tokens yields one gram of all its tokens
    return F.when(k == 0, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.get(toks, i + j) for j in range(n)]))
    )


def dup_ngram_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats (1 − distinct/total) —
    the Gopher-style repetition signal. 0.0 for empty docs."""
    grams = word_ngrams(text, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(
            1.0 - F.size(F.array_distinct(grams)).cast("double")
            / total.cast("double"),
            6,
        )
    )


def dup_line_ratio(text: Column) -> Column:
    """Fraction of lines that are duplicates of an earlier line (C4-style
    boilerplate signal)."""
    lines = F.split(text, "\n")
    total = F.size(lines)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(
            1.0 - F.size(F.array_distinct(lines)).cast("double")
            / total.cast("double"),
            6,
        )
    )


def symbol_word_ratio(text: Column) -> Column:
    """(# count + ellipsis count) / word count — Gopher's symbol-to-word
    ratio signal."""
    n = token_count(text)
    hashes = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    ell = (F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / 3
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round((hashes + ell).cast("double") / n.cast("double"), 6)
    )


def gopher_keep(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_len: float = 3.0,
    max_avg_len: float = 10.0,
    min_stopword_hits: int = 2,
    max_symbol_ratio: float = 0.1,
    max_dup2_ratio: float = 0.2,
) -> Column:
    """Gopher-style quality gate (Rae et al. 2021, §A1.1 heuristics,
    parameterized): word-count bounds, mean-word-length bounds, ≥N stopword
    hits, symbol-to-word ratio cap, duplicate-2-gram cap. Pure Column
    expression → whole-stage codegen, pushes down to the scan."""
    n = token_count(text)
    atl = avg_token_len(text)
    stop_hits = _count_in(tokens(text), STOPWORDS)
    return (
        (n >= min_words) & (n <= max_words)
        & (atl >= min_avg_len) & (atl <= max_avg_len)
        & (stop_hits >= min_stopword_hits)
        & (symbol_word_ratio(text) <= max_symbol_ratio)
        & (dup_ngram_ratio(text, 2) <= max_dup2_ratio)
    )


# GPT-2-style pre-tokenizer, restricted to an ASCII-safe subset whose
# semantics are identical in Java regex (Spark) and RE2 (DuckDB):
# contractions, space-prefixed letter/digit/punctuation runs, whitespace.
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer regex.
    The standard cost estimator for LLM-pipeline budgeting (≈1 BPE token
    per pre-token for ASCII text); JVM-side, no tokenizer library."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-gram strings (space-joined), for MinHash/Jaccard.

    For a doc with < n tokens, returns a single shingle of all tokens.
    """
    toks = tokens(text)
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    # same O(1)-get shape as word_ngrams (see comment there)
    return F.when(k == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(
                " ", *[F.get(toks, i + j) for j in range(n)]))
        )
    )


def shingle_hash(shingle: Column) -> Column:
    """Polynomial hash of a shingle string (same fold as fingerprint).

    Char codes come from one ``split('')`` (O(len)) rather than per-char
    ``substr`` (O(len^2) in interpreted expression evals) — measured 4x
    faster on the shingle-hash projection, identical values incl. the
    empty string (both fold to 0).
    """
    codes = F.transform(F.split(shingle, ""), F.ascii)
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * BASE + c.cast("long")) % MOD
    )


def dedupe_doc_units(text: Column, sep: str = "\n") -> Column:
    """Remove repeated units (lines/paragraphs/words by ``sep``) WITHIN a
    document, keeping first occurrences in order — the C4/RefinedWeb-style
    intra-doc repetition trim (cross-doc dedup is ``paragraph_dedup``).

    Pure native functions (split → array_distinct → array_join): Spark's
    ``array_distinct`` preserves first-occurrence order, there is no
    lambda, so the whole thing stays inside whole-stage codegen — safe
    for the hottest 100 TB map stage.
    """
    return F.array_join(
        F.array_distinct(F.split(text, "\\Q" + sep + "\\E", -1)), sep
    )
