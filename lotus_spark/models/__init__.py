from lotus_spark.models.lm import LM, LMOutput, UsageStats
from lotus_spark.models.fake_lm import (
    FakeLM,
    KeywordBoolLM,
    ScriptedLM,
    EchoLM,
    RegexMapLM,
)
from lotus_spark.models.colbert_rm import ColBERTv2RM, RMOutput
from lotus_spark.models.rm import RM, HashRM, LiteLLMRM, SentenceTransformersRM
from lotus_spark.models.reranker import (
    Reranker,
    HashReranker,
    CrossEncoderReranker,
)

__all__ = [
    "Reranker",
    "HashReranker",
    "CrossEncoderReranker",
    "LM",
    "LMOutput",
    "UsageStats",
    "FakeLM",
    "KeywordBoolLM",
    "ScriptedLM",
    "EchoLM",
    "RegexMapLM",
    "RM",
    "ColBERTv2RM",
    "HashRM",
    "LiteLLMRM",
    "RMOutput",
    "SentenceTransformersRM",
]
