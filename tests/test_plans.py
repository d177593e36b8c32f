"""LazyFrame plan layer + logical optimizers (SURVEY §3.2 / §4.1)."""

import pytest

from pyspark.sql import functions as F

from lotus_spark.models import KeywordBoolLM
from lotus_spark.plans import (
    InstructionSearchOptimizer,
    LazyFrame,
    PredicatePushdownOptimizer,
)
from lotus_spark.plans.lazyframe import OpNode


def test_lazyframe_records_ops_immutably():
    lf = LazyFrame()
    lf2 = lf.sem_filter("{Text} is positive").filter("Level > 100")
    assert lf.ops == []
    assert [n.op for n in lf2.ops] == ["sem_filter", "native:filter"]
    assert lf2.ops[0].is_semantic and lf2.ops[1].is_cheap_filter


def test_predicate_pushdown_moves_native_filter_first():
    lf = (LazyFrame()
          .sem_filter("{Course Name} is about programming")
          .filter("Level > 100"))
    opt = lf.optimize([PredicatePushdownOptimizer()])
    assert [n.op for n in opt.ops] == ["native:filter", "sem_filter"]

    # return_all=True adds a label column → NOT safe to reorder past
    lf2 = (LazyFrame()
           .sem_filter("{x} ok", return_all=True)
           .filter("Level > 100"))
    opt2 = lf2.optimize([PredicatePushdownOptimizer()])
    assert [n.op for n in opt2.ops] == ["sem_filter", "native:filter"]

    # bubbles across a *chain* of semantic filters
    lf3 = (LazyFrame()
           .sem_filter("{x} a").sem_filter("{x} b").filter("c > 1"))
    opt3 = lf3.optimize([PredicatePushdownOptimizer()])
    assert [n.op for n in opt3.ops] == ["native:filter", "sem_filter", "sem_filter"]


def test_lazyframe_execute_replays_on_spark(spark, courses_df):
    from lotus_spark.session import settings

    settings.lm = KeywordBoolLM("programming")
    try:
        lf = (LazyFrame()
              .filter(F.col("Level") >= 200)
              .sem_filter("{Course Name} teaches you to code"))
        out = lf.execute(courses_df)
        names = [r["Course Name"] for r in out.collect()]
        assert names == ["Advanced Programming"]
    finally:
        settings.lm = None


def test_sem_pipeline_pushdown_equivalence(spark):
    """The flagship filter→map→agg semantic chain (oracle query
    ``sem_pipeline``): optimize() hoists the native filter ahead of the
    LLM stage and the optimized plan returns the same result."""
    from lotus_spark.models.demo_lms import CountingAggLM
    from lotus_spark.models.fake_lm import RegexMapLM

    docs = spark.createDataFrame(
        [(1, "spark shuffles data", "en", 200),
         (2, "spark joins tables", "fr", 50),     # pruned by n_chars
         (3, "pandas is local", "en", 300),       # pruned by sem_filter
         (4, "spark scales out", "en", 400)],
        ["doc_id", "text", "lang", "n_chars"],
    )
    lf = (
        LazyFrame()
        .sem_filter("{text} is about distributed computing",
                    lm=KeywordBoolLM("spark"))
        .filter("n_chars >= 100")
        .sem_map("lang {lang} upper",
                 lm=RegexMapLM(r"\[lang\]: «(\w+)»", "upper"))
        .sem_agg("count {text}", lm=CountingAggLM(), group_by=["_map"])
    )
    opt = lf.optimize()
    # the cheap predicate now runs before any model call
    assert opt.ops[0].op == "native:filter"
    assert [r.asDict() for r in opt.execute(docs).orderBy("_map").collect()] \
        == [r.asDict() for r in lf.execute(docs).orderBy("_map").collect()] \
        == [{"_map": "EN", "_output": "2"}]


def test_lazyframe_save_load_roundtrip(tmp_path):
    lf = LazyFrame().sem_map("{a} to french", suffix="_fr").select("a")
    p = str(tmp_path / "plan.pkl")
    lf.save(p)
    loaded = LazyFrame.load(p)
    assert [n.op for n in loaded.ops] == ["sem_map", "native:select"]
    assert loaded.ops[0].kwargs == {"suffix": "_fr"}


def test_from_fn_node(spark):
    df = spark.range(5)
    lf = LazyFrame().from_fn(lambda d, n: d.limit(n), 2)
    assert lf.execute(df).count() == 2


def test_instruction_search_keeps_best(spark, courses_df):
    from lotus_spark.session import settings

    settings.lm = KeywordBoolLM("programming")
    try:
        # eval = number of rows surviving the filter; the proposal that
        # mentions 'programming' matches the fake LM → scores higher
        opt = InstructionSearchOptimizer(
            train_df=courses_df,
            eval_fn=lambda df: float(df.count()),
            propose_fn=lambda instr: [
                "{Course Name} involves programming topics",
                "{Course Name} is about baking",
            ],
        )
        # the candidate containing the fake LM's keyword keeps 8/8 rows
        # (instruction text reaches the prompt); the original keeps 2
        lf = LazyFrame().sem_filter("{Course Name} teaches you to code")
        best = lf.optimize([opt])
        assert "programming" in best.ops[0].args[0]
    finally:
        settings.lm = None


def test_gepa_discover_and_set_params():
    from lotus_spark.plans import ParamPath, discover_params
    from lotus_spark.plans.optimizers import _get_param, _set_param

    lf = (LazyFrame()
          .sem_filter("{t} is good")
          .filter("x > 1")
          .sem_search(col="t", query="find docs", K=5))
    paths = discover_params(lf.ops)
    assert ParamPath(0, "args", 0) in paths
    assert ParamPath(2, "kwargs", "query") in paths
    assert len(paths) == 2

    ops2 = _set_param(lf.ops, ParamPath(2, "kwargs", "query"), "better query")
    assert _get_param(ops2, ParamPath(2, "kwargs", "query")) == "better query"
    assert lf.ops[2].kwargs["query"] == "find docs"  # original untouched


def test_gepa_pareto_prune_keeps_frontier():
    from lotus_spark.plans import GEPAOptimizer

    o = object
    pool = [
        (["a"], [1.0, 0.0]),
        (["b"], [0.0, 1.0]),
        (["c"], [0.6, 0.5]),
        (["d"], [0.4, 0.4]),  # dominated by c
    ]
    kept = GEPAOptimizer._pareto_prune(pool, cap=10)
    names = sorted(k[0][0] for k in kept)
    assert names == ["a", "b", "c"]
    # cap orders by total score
    capped = GEPAOptimizer._pareto_prune(pool, cap=1)
    assert capped[0][0] == ["c"]


def test_gepa_optimizer_picks_best_total(spark, courses_df):
    from lotus_spark.session import settings

    from lotus_spark.plans import GEPAOptimizer

    settings.lm = KeywordBoolLM("programming")
    try:
        seen_feedback = []

        def propose(instr, feedback):
            seen_feedback.append(feedback)
            return ["{Course Name} has programming content"]

        # ex1 rewards keeping rows (keyword instr keeps 8/8), ex2 mildly
        # penalizes them — the keyword candidate wins on total but doesn't
        # dominate, so both plans stay on the Pareto frontier
        opt = GEPAOptimizer(
            eval_examples=[
                (courses_df, lambda df: float(df.count())),
                (courses_df, lambda df: -0.5 * df.count()),
            ],
            propose_fn=propose,
            generations=2,
        )
        lf = LazyFrame().sem_filter("{Course Name} teaches you to code")
        best = lf.optimize([opt])
        assert "programming" in best.ops[0].args[0]
        assert seen_feedback and "scores" in seen_feedback[0]
    finally:
        settings.lm = None


def test_explain_renders_plan():
    s = LazyFrame().sem_filter("{x} ok").filter("y > 1").explain()
    assert "SEM" in s and "nat" in s and "sem_filter" in s


def test_lazyframe_checkpoint_reuse(spark, tmp_path):
    """Plan-prefix checkpoint store (reference ast/run.py:128-160 parity):
    a re-run of the same (source_token, plan) resumes from the persisted
    semantic-node output — the LM is not called again."""
    import glob
    import os
    import uuid

    from lotus_spark.models import FakeLM

    marker_dir = str(tmp_path / "calls")
    os.makedirs(marker_dir, exist_ok=True)

    def fn(prompt, _d=marker_dir):
        # executor-side counter: a marker file per LM call (local-mode FS
        # is shared, so the driver can count them)
        open(os.path.join(_d, uuid.uuid4().hex), "w").close()
        return "True" if "keep" in prompt else "False"

    def n_calls():
        return len(glob.glob(os.path.join(marker_dir, "*")))

    df = spark.createDataFrame(
        [("keep me",), ("drop me",), ("keep too",)], ["text"]
    )
    lf = (LazyFrame()
          .sem_filter("{text} should be kept", lm=FakeLM(fn))
          .select("text"))
    ckdir = str(tmp_path / "ck")

    out1 = lf.execute(df, checkpoint_dir=ckdir, source_token="src@v1")
    rows1 = sorted(r["text"] for r in out1.collect())
    assert rows1 == ["keep me", "keep too"]
    n_after_first = n_calls()
    assert n_after_first >= 3

    out2 = lf.execute(df, checkpoint_dir=ckdir, source_token="src@v1")
    assert sorted(r["text"] for r in out2.collect()) == rows1
    assert n_calls() == n_after_first  # resumed from checkpoint, no LM calls

    # a different source token must NOT reuse the checkpoint
    lf.execute(df, checkpoint_dir=ckdir, source_token="src@v2").collect()
    assert n_calls() > n_after_first

    # plain execute (no checkpoint args) still works and re-runs
    out3 = lf.execute(df)
    assert sorted(r["text"] for r in out3.collect()) == rows1


def test_checkpoint_keys_stable_across_instances(spark, tmp_path):
    """Prefix keys must not depend on object identity (round-3 advice):
    a fresh, identically-configured model — the cross-process / cross-run
    resume case — yields the SAME keys; a differently-configured one
    yields different keys."""
    import glob
    import os
    import uuid

    from lotus_spark.models.fake_lm import KeywordBoolLM

    def plan(lm):
        return LazyFrame().sem_filter("{text} should be kept", lm=lm)

    k1 = plan(KeywordBoolLM("keep"))._prefix_keys("src@v1")
    k2 = plan(KeywordBoolLM("keep"))._prefix_keys("src@v1")
    k3 = plan(KeywordBoolLM("drop"))._prefix_keys("src@v1")
    assert k1 == k2          # same config, new instance → same address
    assert k1 != k3          # different config → different address

    # end-to-end: a re-run with a FRESH model instance resumes from the
    # checkpoint written by the first run (zero new LM calls)
    marker_dir = str(tmp_path / "calls2")
    os.makedirs(marker_dir, exist_ok=True)

    class MarkingLM(KeywordBoolLM):
        def __call__(self, batch, **kw):
            open(os.path.join(marker_dir, uuid.uuid4().hex), "w").close()
            return super().__call__(batch, **kw)

    df = spark.createDataFrame([("keep me",), ("drop me",)], ["text"])
    ckdir = str(tmp_path / "ck2")
    out1 = plan(MarkingLM("keep")).execute(
        df, checkpoint_dir=ckdir, source_token="s@1")
    assert [r["text"] for r in out1.collect()] == ["keep me"]
    n1 = len(glob.glob(os.path.join(marker_dir, "*")))
    assert n1 >= 1
    out2 = plan(MarkingLM("keep")).execute(
        df, checkpoint_dir=ckdir, source_token="s@1")
    assert [r["text"] for r in out2.collect()] == ["keep me"]
    assert len(glob.glob(os.path.join(marker_dir, "*"))) == n1


def test_checkpoint_dir_accepts_fs_uri(spark, tmp_path):
    """Checkpoint dirs resolve through the Hadoop FileSystem API, so an
    explicit file:// URI (the shape an hdfs:///s3a:// deployment uses)
    round-trips: write on run 1, longest-prefix resume on run 2."""
    from lotus_spark.models.fake_lm import KeywordBoolLM

    df = spark.createDataFrame([("keep me",), ("drop me",)], ["text"])
    lf = LazyFrame().sem_filter("{text} should be kept",
                                lm=KeywordBoolLM("keep"))
    ckdir = "file://" + str(tmp_path / "ck_uri")
    out1 = lf.execute(df, checkpoint_dir=ckdir, source_token="s@1")
    assert [r["text"] for r in out1.collect()] == ["keep me"]
    out2 = lf.execute(df, checkpoint_dir=ckdir, source_token="s@1")
    assert [r["text"] for r in out2.collect()] == ["keep me"]


def test_from_fn_checkpoint_resume_mid_pipeline(spark, tmp_path):
    """A multi-stage from_fn pipeline killed mid-run resumes from the
    last completed checkpoint: the already-checkpointed stages are never
    re-invoked (their fns don't even run — execute() fast-forwards to the
    longest existing prefix), and the final result is correct."""
    import pytest
    from pyspark.sql import functions as F

    calls = {"s1": 0, "s2": 0, "s3": 0}
    boom = {"on": True}

    def s1(df):
        calls["s1"] += 1
        return df.filter("v % 2 = 0")

    def s2(df):
        calls["s2"] += 1
        return df.withColumn("w", F.col("v") * 2)

    def s3(df):
        calls["s3"] += 1
        if boom["on"]:
            raise RuntimeError("mid-pipeline failure")
        return df.filter("w > 4")

    df = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    lf = (LazyFrame()
          .from_fn(s1, checkpoint=True)
          .from_fn(s2, checkpoint=True)
          .from_fn(s3, checkpoint=True))
    ck = str(tmp_path / "ck_pipe")
    with pytest.raises(RuntimeError, match="mid-pipeline"):
        lf.execute(df, checkpoint_dir=ck, source_token="docs@v1")
    assert calls == {"s1": 1, "s2": 1, "s3": 1}

    boom["on"] = False  # "fix the failure", re-run the same pipeline
    out = lf.execute(df, checkpoint_dir=ck, source_token="docs@v1")
    assert sorted(r["w"] for r in out.collect()) == [8, 12, 16]
    # stages 1-2 resumed from checkpoint: not re-invoked
    assert calls == {"s1": 1, "s2": 1, "s3": 2}

    # third run: everything checkpointed, no stage re-invoked at all
    out2 = lf.execute(df, checkpoint_dir=ck, source_token="docs@v1")
    assert sorted(r["w"] for r in out2.collect()) == [8, 12, 16]
    assert calls == {"s1": 1, "s2": 1, "s3": 2}

    # a different source token shares nothing
    lf2 = LazyFrame().from_fn(s1, checkpoint=True)
    lf2.execute(df, checkpoint_dir=ck, source_token="docs@v2").collect()
    assert calls["s1"] == 2


def test_stable_tokens_distinguish_dict_config_and_callables():
    """Checkpoint-key regression guards: config dicts (e.g. sampling
    kwargs) and distinct callables must yield distinct identities — both
    previously collapsed, silently resuming from a wrong checkpoint."""
    from lotus_spark.models.lm import stable_config_token
    from lotus_spark.plans.lazyframe import _stable_token

    class Cfg:
        def __init__(self, kw, fn):
            self.kw = kw
            self.fn = fn

    def f1(p):
        return p

    def f2(p):
        return p

    a = stable_config_token(Cfg({"top_p": 0.1}, f1))
    b = stable_config_token(Cfg({"top_p": 0.9}, f1))
    c = stable_config_token(Cfg({"top_p": 0.1}, f2))
    assert a != b and a != c
    # same config, fresh equivalent instance → same token
    assert a == stable_config_token(Cfg({"top_p": 0.1}, f1))

    assert _stable_token(f1) != _stable_token(f2)
    assert _stable_token(f1) == _stable_token(f1)


def test_callable_token_senses_body_edits():
    """Editing a function's *body* (same name/module) must change its
    token, or execute(checkpoint_dir=...) would silently resume from a
    checkpoint computed with the old code (round-4 advice)."""
    from lotus_spark.models.lm import callable_token

    ns1, ns2, ns3 = {}, {}, {}
    exec("def f(x):\n    return x + 1", ns1)
    exec("def f(x):\n    return x + 2", ns2)
    exec("def f(x):\n    return x + 1", ns3)
    assert callable_token(ns1["f"]) != callable_token(ns2["f"])
    # identical source → identical token (cross-process stability)
    assert callable_token(ns1["f"]) == callable_token(ns3["f"])


def test_stable_config_token_slots_and_container_elements():
    """__slots__ objects must not crash (vars() raises TypeError on
    them), and container *elements* with default object repr must not
    leak memory addresses into the token (round-4 advice)."""
    from lotus_spark.models.lm import stable_config_token

    class Slotted:
        __slots__ = ("alpha", "beta")

        def __init__(self):
            self.alpha = 1
            self.beta = "x"

    t = stable_config_token(Slotted())
    assert t == stable_config_token(Slotted())
    assert "alpha" in t and "beta" in t

    class Opaque:  # default object repr embeds " at 0x..."
        pass

    class Holder:
        def __init__(self, items):
            self.items = items

    a = stable_config_token(Holder([Opaque(), 3]))
    b = stable_config_token(Holder([Opaque(), 3]))
    assert a == b
    assert " at 0x" not in a


def test_callable_token_senses_referenced_name_changes():
    """Two bodies that differ only in WHICH global they call share
    co_code (the name lives in co_names) — the token must still differ,
    or swapping a helper inside a from_fn stage silently resumes the old
    stage's checkpoint (round-5 review finding)."""
    from lotus_spark.models.lm import callable_token

    ns1, ns2 = {}, {}
    exec("def f(df):\n    return first_helper(df)", ns1)
    exec("def f(df):\n    return second_helper(df)", ns2)
    assert callable_token(ns1["f"]) != callable_token(ns2["f"])

    # method-name swap too (df.filter vs df.where): also co_names-only
    ns3, ns4 = {}, {}
    exec("def g(df):\n    return df.filter('a')", ns3)
    exec("def g(df):\n    return df.where('a')", ns4)
    assert callable_token(ns3["g"]) != callable_token(ns4["g"])


def test_callable_token_frozenset_const_stable_across_hash_seeds():
    """A frozenset constant iterates in string-hash order, which varies
    per process (PYTHONHASHSEED); the fingerprint must sort elements or
    cross-run checkpoint resume never hits (round-5 review finding)."""
    import subprocess
    import sys

    script = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from lotus_spark.models.lm import callable_token\n"
        "def f(x):\n"
        "    return x in {'alpha', 'beta', 'gamma', 'delta', 'epsilon'}\n"
        "print(callable_token(f))"
    )
    outs = set()
    for seed in ("1", "7"):
        r = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True,
            env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin"},
        )
        assert r.returncode == 0, r.stderr
        outs.add(r.stdout.strip())
    assert len(outs) == 1, f"seed-dependent tokens: {outs}"


def test_lm_cache_key_ignores_mutable_usage_counters():
    """Using a model mutates usage counters; its cache identity must not
    change, or the second execution of a checkpointed plan misses every
    prefix and re-pays the LLM stages (round-5 review finding)."""
    from lotus_spark.models.fake_lm import KeywordBoolLM

    lm = KeywordBoolLM("spark")
    before = lm.cache_key()
    lm.usage.prompt_tokens += 1234
    lm.usage.cost += 0.5
    assert lm.cache_key() == before


def test_value_token_distinguishes_configured_objects_in_containers():
    """A config-bearing object (default repr, no cache_key) inside a
    container must tokenize by its public attrs, not bare class identity
    — class-only keys make two different configs share a checkpoint
    (false HIT: stale results for the new config)."""
    from lotus_spark.models.lm import _value_token

    class Cfg:
        def __init__(self, threshold):
            self.threshold = threshold

    assert _value_token([Cfg(0.2)]) != _value_token([Cfg(0.9)])
    assert _value_token([Cfg(0.2)]) == _value_token([Cfg(0.2)])

    class Cyclic:
        def __init__(self):
            self.me = self

    # cyclic object graph degrades to class identity instead of recursing
    t = _value_token([Cyclic()])
    assert "Cyclic" in t


def test_lazyframe_multi_input_union_and_join(spark):
    """Multi-input pipelines (reference ast SourceNode bindings +
    concat, tests/test_ast.py:24-50): named sources resolve from the
    dict passed to execute; union_with/join_with children execute
    against the same sources."""
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    right = spark.createDataFrame([(2, "B"), (3, "C")], ["id", "w"])

    lf = (LazyFrame.from_source("left")
          .filter("id >= 1")
          .join_with(LazyFrame.from_source("right"), on="id", how="inner"))
    out = lf.execute({"left": left, "right": right}).collect()
    assert [(r["id"], r["v"], r["w"]) for r in out] == [(2, "b", "B")]

    # union with a transformed child pipeline
    u = (LazyFrame.from_source("left")
         .union_with(LazyFrame.from_source("right")
                     .withColumnRenamed("w", "v")))
    got = sorted((r["id"], r["v"])
                 for r in u.execute({"left": left, "right": right}).collect())
    assert got == [(1, "a"), (2, "B"), (2, "b"), (3, "C")]

    # concrete-DataFrame child works without a sources dict
    u2 = LazyFrame().union_with(right.withColumnRenamed("w", "v"))
    assert u2.execute(left).count() == 4

    # concat == chained union
    c = LazyFrame.concat([LazyFrame.from_source("left"),
                          LazyFrame.from_source("right")
                          .withColumnRenamed("w", "v")])
    assert c.execute({"left": left, "right": right}).count() == 4


def test_lazyframe_multi_input_errors_and_save(spark, tmp_path):
    left = spark.createDataFrame([(1,)], ["id"])

    with pytest.raises(ValueError, match="from_source"):
        LazyFrame().filter("id > 0").execute({"a": left, "b": left})
    with pytest.raises(KeyError, match="'right'"):
        LazyFrame.from_source("right").execute({"left": left})

    # LazyFrame children pickle through save/load with source binding
    lf = (LazyFrame.from_source("left")
          .union_with(LazyFrame.from_source("right")))
    p = str(tmp_path / "multi.pkl")
    lf.save(p)
    loaded = LazyFrame.load(p)
    assert loaded._source == "left"
    assert isinstance(loaded.ops[0].child, LazyFrame)
    assert loaded.ops[0].child._source == "right"

    # concrete-DataFrame children refuse to pickle with a clear error
    with pytest.raises(ValueError, match="named source"):
        LazyFrame().union_with(left).save(str(tmp_path / "bad.pkl"))


def test_prefix_keys_distinguish_child_plans():
    """Checkpoint keys must change when a union/join CHILD pipeline
    changes — otherwise editing the other side of a join silently
    resumes the old merged checkpoint."""
    toks = {"l": "l@1", "r": "r@1"}
    a = LazyFrame.from_source("l").join_with(
        LazyFrame.from_source("r").filter("x > 1"), on="id")
    b = LazyFrame.from_source("l").join_with(
        LazyFrame.from_source("r").filter("x > 2"), on="id")
    assert a._prefix_keys(toks)[-1] != b._prefix_keys(toks)[-1]
    assert a._prefix_keys(toks) == a._prefix_keys(toks)


def test_prefix_keys_capture_child_data_identity():
    """Round-5 advice: the CHILD source's DATA token must reach the key
    — regenerating the secondary table in place (new token) must miss,
    not silently resume the stale merged checkpoint."""
    a = LazyFrame.from_source("l").join_with(
        LazyFrame.from_source("r").filter("x > 1"), on="id")
    k1 = a._prefix_keys({"l": "l@1", "r": "r@1"})
    k2 = a._prefix_keys({"l": "l@1", "r": "r@2"})  # r regenerated
    assert k1[-1] != k2[-1]
    # an op-less child (bare from_source) is data identity alone
    u = LazyFrame.from_source("l").union_with(LazyFrame.from_source("r"))
    assert (u._prefix_keys({"l": "l@1", "r": "r@1"})[-1]
            != u._prefix_keys({"l": "l@1", "r": "r@2"})[-1])


def test_prefix_keys_disable_on_unversioned_child(spark):
    """A child whose data has no token — a concrete DataFrame, or a
    named source missing from the token dict / a plain-str token — gets
    NO key (None) at and after that node: a constant placeholder would
    collide two different inputs onto one key (false checkpoint HIT)."""
    right = spark.createDataFrame([(1, "a")], ["id", "v"])
    lf = (LazyFrame.from_source("l").filter("id > 0")
          .join_with(right, on="id").select("id"))
    keys = lf._prefix_keys({"l": "l@1"})
    assert keys[0] is not None          # pre-child prefixes stay usable
    assert keys[1] is None and keys[2] is None
    # named child, but the caller passed a single str token: the child's
    # data identity is unknown → disabled from the child node on
    lf2 = (LazyFrame().filter("id > 0")
           .union_with(LazyFrame.from_source("r")).select("id"))
    keys2 = lf2._prefix_keys("t@1")
    assert keys2[0] is not None and keys2[1] is None and keys2[2] is None


def test_checkpoint_execute_skips_unversioned_child_nodes(spark, tmp_path):
    """execute() with an opaque-DataFrame child neither writes nor
    resumes checkpoints at/after that node — two different child
    DataFrames through the same plan produce correct (different)
    results instead of the second run resuming the first's merge."""
    base = spark.createDataFrame([(1,)], ["id"])
    ck = str(tmp_path / "ckchild")
    for val, expect in (("a", ["a"]), ("b", ["b"])):
        child = spark.createDataFrame([(1, val)], ["id", "v"])
        lf = LazyFrame().join_with(child, on="id")
        out = lf.execute(base, checkpoint_dir=ck, source_token="s@1")
        assert [r["v"] for r in out.collect()] == expect


def test_source_token_changes_when_data_regenerated(tmp_path):
    """The composed pipelines' checkpoint source token must fingerprint
    the parquet content (size+mtime), so regenerating a table in place
    invalidates stale stage checkpoints."""
    import os
    import time

    import __spark_entry__ as entry

    d = tmp_path / "sfX"
    p = d / "documents.parquet"
    p.mkdir(parents=True)
    (p / "part-0.parquet").write_bytes(b"aaaa")
    t1 = entry._source_token(str(d), "documents")
    assert str(p) in t1
    # same content: token stable
    assert entry._source_token(str(d), "documents") == t1
    # regenerated file (different size): token changes
    (p / "part-0.parquet").write_bytes(b"bbbbbbbb")
    t2 = entry._source_token(str(d), "documents")
    assert t2 != t1
    # same size, newer mtime: token still changes
    time.sleep(1.1)
    (p / "part-0.parquet").write_bytes(b"cccccccc")
    os.utime(p / "part-0.parquet")
    assert entry._source_token(str(d), "documents") != t2
    # missing table: degrades to empty stats, no crash
    assert "[]" in entry._source_token(str(d), "missing")


def test_filter_reorder_most_selective_first(spark, courses_df):
    """Expensive-predicate placement: the sem_filter run is reordered by
    sampled selectivity (uniform costs), the result set is unchanged,
    and non-adjacent / return_all / native nodes never move."""
    from lotus_spark.plans import FilterReorderOptimizer

    lf = (LazyFrame()
          .sem_filter("{Course Name} x", lm=KeywordBoolLM("Cooking"))
          .sem_filter("{Course Name} y", lm=KeywordBoolLM("Italian")))
    opt = lf.optimize([FilterReorderOptimizer(train_df=courses_df)])
    # 'Italian' keeps 1/8, 'Cooking' 2/8 -> Italian (more
    # selective) first under uniform costs
    assert [n.kwargs["lm"].keyword for n in opt.ops] == ["Italian", "Cooking"]
    # result set identical to unoptimized order
    a = sorted(r["Course Name"] for r in lf.execute(courses_df).collect())
    b = sorted(r["Course Name"] for r in opt.execute(courses_df).collect())
    assert a == b == ["Italian Cooking"]

    # cost overrides flip the order: make the selective one 100x dearer
    # (keyed by instruction string — stable under node-position shifts)
    opt2 = lf.optimize([FilterReorderOptimizer(
        train_df=courses_df, costs={"{Course Name} y": 100.0})])
    assert [n.kwargs["lm"].keyword for n in opt2.ops] == ["Cooking", "Italian"]

    # no train data -> no-op; return_all breaks the run
    assert [n.kwargs["lm"].keyword
            for n in lf.optimize([FilterReorderOptimizer()]).ops] == \
        ["Cooking", "Italian"]
    lf3 = (LazyFrame()
           .sem_filter("{Course Name} x", lm=KeywordBoolLM("Cooking"),
                       return_all=True)
           .sem_filter("{Course Name} y", lm=KeywordBoolLM("Italian")))
    opt3 = lf3.optimize([FilterReorderOptimizer(train_df=courses_df)])
    assert [n.kwargs["lm"].keyword for n in opt3.ops] == ["Cooking", "Italian"]


def test_sweep_stale_checkpoints(tmp_path):
    import os
    import time

    import __spark_entry__ as entry

    ck = tmp_path / "ck"
    (ck / "old_key").mkdir(parents=True)
    (ck / "old_key" / "part.parquet").write_bytes(b"x")
    (ck / "fresh_key").mkdir()
    old = time.time() - 10 * 86400
    os.utime(ck / "old_key", (old, old))
    entry._sweep_stale_checkpoints(str(ck), max_age_days=7)
    assert not (ck / "old_key").exists()
    assert (ck / "fresh_key").exists()
    entry._sweep_stale_checkpoints(str(ck / "missing"))  # no crash


def test_optimize_preserves_source_binding(spark, courses_df):
    """optimize() must keep the from_source name — multi-input pipelines
    broke (ValueError at execute) when the optimizer chain dropped it."""
    from lotus_spark.plans import PredicatePushdownOptimizer

    lf = (LazyFrame.from_source("left")
          .sem_filter("{Course Name} z", lm=KeywordBoolLM("Cooking"))
          .filter("Level >= 100"))
    opt = lf.optimize([PredicatePushdownOptimizer()])
    out = opt.execute({"left": courses_df})
    assert out.count() == 2   # Cooking Basics, Italian Cooking


def test_filter_reorder_skips_unlearned_cascades(spark, courses_df):
    """A cascade sem_filter with unpinned taus calibrates on ITS input —
    reordering would change the calibration distribution, so the
    optimizer must leave such runs alone."""
    from lotus_spark.cascades.filter_cascade import CascadeArgs
    from lotus_spark.plans import FilterReorderOptimizer

    lf = (LazyFrame()
          .sem_filter("{Course Name} x", lm=KeywordBoolLM("Cooking"),
                      cascade_args=CascadeArgs())
          .sem_filter("{Course Name} y", lm=KeywordBoolLM("Italian")))
    opt = lf.optimize([FilterReorderOptimizer(train_df=courses_df)])
    assert [n.kwargs.get("lm").keyword for n in opt.ops] == \
        ["Cooking", "Italian"]           # untouched


def test_calibration_store_shares_oracle_labels_across_optimizers(
        spark, courses_df, tmp_path):
    """Round-5 advice item 3: one oracle labeling pass feeds BOTH τ
    learning (CascadePrewarmOptimizer) and selectivity estimation
    (FilterReorderOptimizer). With a shared CalibrationStore the reorder
    stage reuses the cascade's labels — strictly fewer oracle LM calls
    than the unshared chain — and still reorders most-selective-first."""
    import glob
    import os
    import uuid

    from lotus_spark.cascades.filter_cascade import CascadeArgs
    from lotus_spark.plans import (
        CalibrationStore,
        CascadePrewarmOptimizer,
        FilterReorderOptimizer,
    )

    # oracle calls happen BOTH driver-side (the prewarm's sample
    # labeling) and executor-side (the reorderer's sem_filter pass), so
    # count via marker files on the shared local FS, not usage counters
    class MarkingLM(KeywordBoolLM):
        def __init__(self, keyword, marker_dir):
            super().__init__(keyword)
            self.marker_dir = marker_dir
            inner = self.fn

            def fn(prompt):
                open(os.path.join(marker_dir, uuid.uuid4().hex), "w").close()
                return inner(prompt)

            self.fn = fn

    def optimize(store, marker_dir):
        os.makedirs(marker_dir, exist_ok=True)
        lf = (LazyFrame()
              .sem_filter("{Course Name} x",
                          lm=MarkingLM("Cooking", marker_dir),
                          helper_lm=KeywordBoolLM("Cooking", 0.8),
                          cascade_args=CascadeArgs())
              .sem_filter("{Course Name} y",
                          lm=MarkingLM("Italian", marker_dir),
                          helper_lm=KeywordBoolLM("Italian", 0.8),
                          cascade_args=CascadeArgs()))
        opt = lf.optimize([
            CascadePrewarmOptimizer(train_df=courses_df, store=store),
            FilterReorderOptimizer(train_df=courses_df, store=store),
        ])
        return opt, len(glob.glob(os.path.join(marker_dir, "*")))

    shared_store = CalibrationStore()
    opt_shared, calls_shared = optimize(
        shared_store, str(tmp_path / "shared"))
    opt_plain, calls_plain = optimize(None, str(tmp_path / "plain"))

    # prewarm pinned the taus in both runs
    for o in (opt_shared, opt_plain):
        assert all(n.kwargs["cascade_args"].tau_pos is not None
                   for n in o.ops)
    # ...so both runs could reorder: Italian (1/8 kept) before Cooking
    # (2/8 kept) under uniform costs
    assert [n.kwargs["lm"].keyword for n in opt_shared.ops] == \
        [n.kwargs["lm"].keyword for n in opt_plain.ops] == \
        ["Italian", "Cooking"]
    # the shared chain paid ONE oracle labeling pass per filter (the
    # prewarm's); the unshared one paid that PLUS the reorderer's own
    # sample pass — halved optimize-time oracle calls
    assert calls_shared == calls_plain // 2
    # and the store holds both selectivity estimates
    assert shared_store.selectivity("{Course Name} x") is not None
    assert shared_store.selectivity("{Course Name} y") is not None


def test_multi_source_checkpoint_child_token_staleness(spark, tmp_path):
    """End-to-end round-5-advice scenario: a checkpointed stage AFTER a
    join_with must resume on identical tokens, and MISS (recompute with
    the new data) when the CHILD source's token changes — the stale-
    merged-results hazard the per-source token dict exists to prevent."""
    import glob
    import os
    import uuid

    marker_dir = str(tmp_path / "fn_calls")
    os.makedirs(marker_dir)

    def mark_and_pass(df):
        open(os.path.join(marker_dir, uuid.uuid4().hex), "w").close()
        return df

    def n_calls():
        return len(glob.glob(os.path.join(marker_dir, "*")))

    left = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "l"])
    right_v1 = spark.createDataFrame([(1, "old")], ["id", "r"])
    right_v2 = spark.createDataFrame([(1, "new")], ["id", "r"])
    lf = (LazyFrame.from_source("l")
          .join_with(LazyFrame.from_source("r"), on="id")
          .from_fn(mark_and_pass, checkpoint=True))
    ck = str(tmp_path / "ck_multi")

    out1 = lf.execute({"l": left, "r": right_v1}, checkpoint_dir=ck,
                      source_token={"l": "l@1", "r": "r@1"})
    assert [r["r"] for r in out1.collect()] == ["old"]
    assert n_calls() == 1

    # identical tokens: resumes from the post-join checkpoint, fn not run
    out2 = lf.execute({"l": left, "r": right_v1}, checkpoint_dir=ck,
                      source_token={"l": "l@1", "r": "r@1"})
    assert [r["r"] for r in out2.collect()] == ["old"]
    assert n_calls() == 1

    # right regenerated in place (new token): the old behavior would
    # silently resume 'old'; now the key misses and the merge recomputes
    out3 = lf.execute({"l": left, "r": right_v2}, checkpoint_dir=ck,
                      source_token={"l": "l@1", "r": "r@2"})
    assert [r["r"] for r in out3.collect()] == ["new"]
    assert n_calls() == 2


def test_multi_source_checkpoint_rejects_str_token(spark, tmp_path):
    """A dict of source DataFrames with a single str token is rejected:
    the str cannot say which table it versions, so an op-ful join/union
    child would be keyed by the parent's token while executing on a
    different table — regenerating that table in place would silently
    resume stale post-join checkpoints. execute() must raise, not
    guess."""
    from lotus_spark.plans.lazyframe import LazyFrame

    left = spark.createDataFrame([(1, "x")], ["id", "l"])
    right = spark.createDataFrame([(1, "y")], ["id", "r"])
    lf = (LazyFrame.from_source("l")
          .join_with(LazyFrame.from_source("r"), on="id"))
    with pytest.raises(ValueError, match="dict"):
        lf.execute({"l": left, "r": right},
                   checkpoint_dir=str(tmp_path / "ck"),
                   source_token="v1")
    # without checkpointing the same call is fine (nothing to key)
    out = lf.execute({"l": left, "r": right})
    assert out.count() == 1
