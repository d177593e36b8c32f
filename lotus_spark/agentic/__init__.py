from lotus_spark.agentic.corpus import Corpus, Unit
from lotus_spark.agentic.tools import Tool, tool, PythonREPLTool
from lotus_spark.agentic.loop import (
    AgentStep,
    ToolCall,
    ScriptedCompleter,
    LiteLLMCompleter,
    run_agent,
)
from lotus_spark.agentic.planner import Plan, derive_plan, normalize_ops
from lotus_spark.agentic.pipeline import run_pipeline, AgentResult

__all__ = [
    "Corpus",
    "Unit",
    "Tool",
    "tool",
    "PythonREPLTool",
    "AgentStep",
    "ToolCall",
    "ScriptedCompleter",
    "LiteLLMCompleter",
    "run_agent",
    "Plan",
    "derive_plan",
    "normalize_ops",
    "run_pipeline",
    "AgentResult",
]
