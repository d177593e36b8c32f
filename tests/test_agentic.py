"""Hermetic agentic map/filter/reduce tests (reference pattern:
``tests/test_agentic_map_reduce.py`` injects fake completers so no network)."""

import pytest

from lotus_spark.agentic import (
    AgentStep,
    Corpus,
    Plan,
    PythonREPLTool,
    ScriptedCompleter,
    ToolCall,
    normalize_ops,
    run_agent,
    run_pipeline,
    tool,
)
from lotus_spark.agentic.pipeline import parse_unit_array, parse_verdict


# ---------------------------------------------------------------- ops / plan
def test_normalize_ops_defaults_and_validation():
    assert normalize_ops(None) == ["map", "reduce"]
    assert normalize_ops("reduce") == ["reduce"]
    assert normalize_ops(["filter", "map", "reduce"]) == ["filter", "map", "reduce"]
    with pytest.raises(ValueError):
        normalize_ops(["reduce", "map"])  # terminal op must be last
    with pytest.raises(ValueError):
        normalize_ops(["map", "map"])  # duplicates
    with pytest.raises(ValueError):
        normalize_ops(["fold"])  # unknown
    with pytest.raises(ValueError):
        normalize_ops([])


def test_verdict_parsing_defaults_to_keep():
    assert parse_verdict("VERDICT: KEEP")
    assert not parse_verdict("blah\nVERDICT: DROP")
    assert not parse_verdict("we should drop this")
    assert parse_verdict("no verdict at all")
    assert parse_verdict("")


def test_batched_array_parsing():
    text = 'preamble [{"id": "a", "keep": true}, {"id": "b", "keep": false}]'
    assert parse_unit_array(text, "filter") == {
        "a": "VERDICT: KEEP",
        "b": "VERDICT: DROP",
    }
    text2 = '[{"id": 1, "output": "x"}]'
    assert parse_unit_array(text2, "map") == {"1": "x"}
    assert parse_unit_array("not json", "map") == {}


# ---------------------------------------------------------------- agent loop
def test_run_agent_tool_roundtrip_and_budget():
    @tool(description="double an int")
    def double(x: int) -> str:
        return str(2 * x)

    def fn(messages):
        if messages[-1]["role"] == "tool":
            return f"final: {messages[-1]['content']}"
        return AgentStep(tool_calls=[ToolCall("t1", "double", {"x": 21})])

    res = run_agent(ScriptedCompleter(fn), [double], "sys", "user", max_steps=4)
    assert res.output == "final: 42"
    assert res.steps == 2 and not res.truncated
    assert res.trace[0]["result"] == "42"

    # never-answering completer: budget exhausts, forced tool-free final turn
    def loop_fn(messages):
        if messages[-1].get("content", "").startswith("Answer now"):
            return "forced"
        return AgentStep(tool_calls=[ToolCall("t", "double", {"x": 1})])

    res2 = run_agent(ScriptedCompleter(loop_fn), [double], "s", "u", max_steps=2)
    assert res2.truncated and res2.output == "forced"

    # unknown tool + raising tool are fed back as errors, not fatal
    @tool(description="always fails")
    def boom() -> str:
        raise RuntimeError("nope")

    def bad_fn(messages):
        if messages[-1]["role"] == "tool":
            return messages[-1]["content"]
        return AgentStep(tool_calls=[ToolCall("t", "boom", {})])

    res3 = run_agent(ScriptedCompleter(bad_fn), [boom], "s", "u")
    assert "RuntimeError" in res3.output


def test_python_repl_tool_sandbox():
    t = PythonREPLTool(timeout=15)
    assert t.run(code="print(6*7)") == "42"
    assert "ZeroDivisionError" in t.run(code="1/0")
    assert "timed out" in PythonREPLTool(timeout=1).run(
        code="import time; time.sleep(5)"
    )


# ------------------------------------------------------------- full pipeline
# NB: completers are defined as *closures* inside each test so cloudpickle
# serializes them by value — pytest test modules aren't importable on executors.
def _make_kw_factory():
    def kw_completer(messages):
        """filter: keep 'cs' shards; map: tag; reduce: count findings."""
        user = [m for m in messages if m["role"] == "user"][-1]["content"]
        sys0 = messages[0]["content"]
        if "final aggregator" in sys0:
            return f"kept={user.count('[finding')}"
        shard = user.split("YOUR SHARD:")[-1].lower()
        if "keep-or-drop" in sys0:
            return "VERDICT: KEEP" if "cs" in shard else "VERDICT: DROP"
        return "TAGGED " + shard.strip().splitlines()[-1]

    def factory(tools):
        return ScriptedCompleter(kw_completer)

    return factory


def test_pipeline_filter_map_reduce(spark):
    _kw_factory = _make_kw_factory()
    corpus = Corpus.from_text(
        spark,
        ["cs: algorithms", "cooking: souffle", "cs: compilers", "art: fresco"],
    )
    plan = Plan(ops=["filter", "map", "reduce"],
                instructions={"filter": "f", "map": "m", "reduce": "r"})
    res = run_pipeline(corpus, "task", ops=["filter", "map", "reduce"],
                       completer_factory=_kw_factory, plan=plan)
    assert res.output == "kept=2"
    assert sorted(res.findings) == ["TAGGED cs: algorithms", "TAGGED cs: compilers"]
    assert res.corpus is None  # collapsed by reduce


def test_pipeline_map_only_returns_corpus(spark):
    _kw_factory = _make_kw_factory()
    corpus = Corpus.from_text(spark, ["cs: a", "cs: b"])
    plan = Plan(ops=["map"], instructions={"map": "m"})
    res = run_pipeline(corpus, "t", ops=["map"],
                       completer_factory=_kw_factory, plan=plan)
    assert res.output is None
    out = {r["content"] for r in res.corpus.df.collect()}
    assert out == {"TAGGED cs: a", "TAGGED cs: b"}
    meta = res.corpus.df.select("metadata").first()[0]
    assert meta["op"] == "map"


def test_pipeline_batched_filter(spark):
    def batched_completer(messages):
        import json as _json
        user = [m for m in messages if m["role"] == "user"][-1]["content"]
        ids = [ln.split("]")[0] for ln in user.split("[unit ")[1:]]
        return _json.dumps([{"id": i, "keep": "cs" in user} for i in ids])

    def factory(tools):
        return ScriptedCompleter(batched_completer)

    corpus = Corpus.from_text(spark, ["cs: a", "cs: b", "cs: c", "cs: d"])
    plan = Plan(ops=["filter"], instructions={"filter": "f"},
                strategies={"filter": "batched"}, shard_size=2)
    res = run_pipeline(corpus, "t", ops=["filter"],
                       completer_factory=factory, plan=plan)
    assert res.corpus.count() == 4  # all mention cs → all kept, via JSON array


def test_pipeline_executor_side_tool_calls(spark):
    """Agents inside applyInPandas can spawn the subprocess REPL on executors."""
    def tool_filter_completer(messages):
        if messages[-1]["role"] == "tool":
            return ("VERDICT: KEEP" if messages[-1]["content"].strip() == "64"
                    else "VERDICT: DROP")
        return AgentStep(
            tool_calls=[ToolCall("c1", "python_repl", {"code": "print(2**6)"})]
        )

    def factory(tools):
        return ScriptedCompleter(tool_filter_completer)

    corpus = Corpus.from_text(spark, ["a", "b", "c"])
    plan = Plan(ops=["filter"], instructions={"filter": "f"})
    res = run_pipeline(corpus, "t", ops=["filter"],
                       tools=[PythonREPLTool(timeout=15)],
                       completer_factory=factory, plan=plan)
    assert res.corpus.count() == 3


def test_corpus_agent_method(spark):
    """Corpus.agent(...) is the reference's fluent entry point."""
    _kw_factory = _make_kw_factory()
    corpus = Corpus.from_text(spark, ["cs: a", "art: b"])
    res = corpus.agent(
        "t", ops=["filter"], completer_factory=_kw_factory,
        plan=Plan(ops=["filter"], instructions={"filter": "f"}),
    )
    assert res.corpus.count() == 1
