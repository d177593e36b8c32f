from lotus_spark.models.lm import LM, LMOutput, UsageStats
from lotus_spark.models.fake_lm import (
    FakeLM,
    KeywordBoolLM,
    ScriptedLM,
    EchoLM,
    RegexMapLM,
)
from lotus_spark.models.rm import RM, HashRM

__all__ = [
    "LM",
    "LMOutput",
    "UsageStats",
    "FakeLM",
    "KeywordBoolLM",
    "ScriptedLM",
    "EchoLM",
    "RegexMapLM",
    "RM",
    "HashRM",
]
