from lotus_spark.functions.vectors import dot, l2_norm, cosine_sim
from lotus_spark.functions.text import (
    token_count,
    stopword_ratio,
    alpha_ratio,
    quality_score,
    lang_id,
    fingerprint,
    word_shingles,
)

__all__ = [
    "dot",
    "l2_norm",
    "cosine_sim",
    "token_count",
    "stopword_ratio",
    "alpha_ratio",
    "quality_score",
    "lang_id",
    "fingerprint",
    "word_shingles",
]
