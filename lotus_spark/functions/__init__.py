from lotus_spark.functions.vectors import dot, l2_norm, cosine_sim
from lotus_spark.functions.dedup import (
    exact_dedup,
    minhash_signature,
    minhash_lsh_dedup,
    simhash,
    jaccard_sim_pairs,
    embedding_neardup_pairs,
)
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
    "exact_dedup",
    "minhash_signature",
    "minhash_lsh_dedup",
    "simhash",
    "jaccard_sim_pairs",
    "embedding_neardup_pairs",
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
