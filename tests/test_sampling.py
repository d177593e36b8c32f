import pytest
from pyspark.sql import functions as F

from lotus_spark.functions.sampling import pack_sequences, stratified_sample


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(2000)], ["id", "lang"]
    )
    picked = stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}, "id")
    by_lang = {r["lang"]: r["n"] for r in
               picked.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 400 <= by_lang["en"] <= 600          # ~500 of 1000
    assert 50 <= by_lang.get("de", 0) <= 160    # ~100 of 1000

    # determinism: same ids survive regardless of partitioning
    a = {r["id"] for r in picked.collect()}
    b = {r["id"] for r in
         stratified_sample(df.repartition(17), "lang",
                           {"en": 0.5, "de": 0.1}, "id").collect()}
    assert a == b

    # monotone: raising a rate only ADDS rows (nested samples)
    bigger = {r["id"] for r in
              stratified_sample(df, "lang", {"en": 0.8, "de": 0.1},
                                "id").collect()}
    assert a <= bigger

    # default rate applies to unlisted strata; None drops them
    assert stratified_sample(df, "lang", {"en": 0.5}, "id").filter(
        F.col("lang") == "de").count() == 0
    assert stratified_sample(df, "lang", {}, "id", default=1.0).count() == 2000

    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, "lang", {"en": 1.5}, "id")


def test_pack_sequences_concat_and_chunk(spark):
    rows = [(i, f"d{i}", t) for i, t in
            enumerate([30, 80, 100, 5, 0, 60])]  # tape length 275
    df = spark.createDataFrame(rows, ["ord", "doc", "toks"])
    out = {r["doc"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
           for r in pack_sequences(df, "toks", 100, "ord").collect()}
    assert out["d0"] == (0, 0, 1)     # tokens [0,30)
    assert out["d1"] == (0, 30, 2)    # [30,110) straddles the cut at 100
    assert out["d2"] == (1, 10, 2)    # [110,210)
    assert out["d3"] == (2, 10, 1)    # [210,215)
    assert out["d4"] == (2, 15, 1)    # zero tokens: position only
    assert out["d5"] == (2, 15, 1)    # [215,275)

    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(df, "toks", 0, "ord")


def test_pack_sequences_rejects_null_order_keys(spark):
    """Round-5 advice: a NULL tape key used to NULL out the segment id
    and crash the totals sort with a bare TypeError; it must instead
    raise a clear contract error (a NULL key has no tape position)."""
    df = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)],
        "ord int, toks int",
    )
    with pytest.raises(ValueError, match="NULL"):
        pack_sequences(df, "toks", 100, "ord")
    # several partitions' worth of rows with one NULL: same clear error
    big = spark.createDataFrame(
        [(i, 5) for i in range(200)] + [(None, 5)], "ord int, toks int"
    )
    with pytest.raises(ValueError, match="NULL"):
        pack_sequences(big, "toks", 64, "ord", partitions=8)


def test_pack_sequences_distributed_scan_matches_single_partition(spark):
    # the range-partitioned scan must equal the trivially-correct 1-partition
    # run on the same data, for any partition count
    df = spark.createDataFrame(
        [(i, (i * 37) % 90 + 1) for i in range(500)], ["ord", "toks"]
    )
    ref = {r["ord"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
           for r in pack_sequences(df, "toks", 128, "ord",
                                   partitions=1).collect()}
    for n in (3, 8, 32):
        got = {r["ord"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
               for r in pack_sequences(df, "toks", 128, "ord",
                                       partitions=n).collect()}
        assert got == ref, n


def test_pack_sequences_same_plan_executes_identically_twice(spark):
    """Regression for the sf0.1 bug: the returned plan embeds
    driver-collected prefix totals, so a SECOND action over the same
    DataFrame must reproduce the first exactly. The old implementation
    derived segments from spark_partition_id() over a sampled range
    exchange — a re-execution could sample different boundaries than the
    baked totals and shift whole segments."""
    df = spark.createDataFrame(
        [(i, (i * 53) % 70 + 1) for i in range(2000)], ["ord", "toks"]
    )
    out = pack_sequences(df, "toks", 256, "ord", partitions=8)
    first = sorted(map(tuple, out.collect()))
    # churn RDD ids so a resample (if any existed) would likely diverge
    for _ in range(3):
        spark.range(100).repartition(5).count()
    assert sorted(map(tuple, out.collect())) == first

    # and both match a driver-side reference computation
    rows = sorted((r.ord, r.toks) for r in df.collect())
    cum, ref = 0, {}
    for o, t in rows:
        start = cum
        cum += t
        last = cum - 1 if t > 0 else start
        ref[o] = (start // 256, start % 256, last // 256 - start // 256 + 1)
    got = {r["ord"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
           for r in out.collect()}
    assert got == ref


# ---------------------------------------------------- quantile_filter

def test_quantile_filter_per_group_exact_rank(spark):
    from lotus_spark.functions.sampling import quantile_filter

    rows = [("en", i, i * 1.0) for i in range(5)] + \
           [("fr", i, -i * 1.0) for i in range(3)]
    df = spark.createDataFrame(rows, ["lang", "doc_id", "score"])
    out = quantile_filter(df, "score", 0.5, by="lang", tiebreak="doc_id")
    got = sorted((r["lang"], r["doc_id"]) for r in out.collect())
    # en: scores 4,3,2 have percent_rank 0,.25,.5 — kept; fr: 0,-1 kept
    assert got == [("en", 2), ("en", 3), ("en", 4), ("fr", 0), ("fr", 1)]


def test_quantile_filter_ascending_and_edge_cases(spark):
    import pytest as _pytest

    from lotus_spark.functions.sampling import quantile_filter

    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, 20.0), ("h", 3, 5.0)],
        ["g", "doc_id", "score"])
    low = quantile_filter(df, "score", 0.0001, by="g", ascending=True,
                          tiebreak="doc_id")
    # single-row group: percent_rank 0 is always kept
    got = sorted((r["g"], r["doc_id"]) for r in low.collect())
    assert got == [("g", 1), ("h", 3)]
    with _pytest.raises(ValueError, match="keep_frac"):
        quantile_filter(df, "score", 1.5)
    assert quantile_filter(df, "score", 1.0, by="g").count() == 3


# --------------------------------------------------------- cap_per_key

def test_cap_per_key_keeps_best(spark):
    from lotus_spark.functions.sampling import cap_per_key

    rows = [("a.com", i, i * 10.0) for i in range(6)] + [("b.org", 0, 1.0)]
    df = spark.createDataFrame(rows, ["domain", "doc_id", "score"])
    out = cap_per_key(df, "domain", 2, order_by="score", tiebreak="doc_id")
    got = sorted((r["domain"], r["doc_id"]) for r in out.collect())
    assert got == [("a.com", 4), ("a.com", 5), ("b.org", 0)]
    # under-cap keys keep everything
    assert cap_per_key(df, "domain", 10, order_by="score").count() == 7


def test_cap_per_key_validation(spark):
    import pytest as _pytest

    from lotus_spark.functions.sampling import cap_per_key

    df = spark.createDataFrame([("k", 1)], ["k", "v"])
    with _pytest.raises(ValueError, match="max_rows"):
        cap_per_key(df, "k", 0)


def test_quantile_filter_matches_bruteforce(spark):
    """Random data: kept set equals a Python percent_rank replica."""
    import random

    from lotus_spark.functions.sampling import quantile_filter

    rng = random.Random(11)
    rows = [(f"g{rng.randrange(4)}", i, float(rng.randrange(100)))
            for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "doc_id", "score"])
    frac = 0.35
    got = sorted(r["doc_id"] for r in
                 quantile_filter(df, "score", frac, by="g",
                                 tiebreak="doc_id").collect())

    by_g: dict = {}
    for g, i, s in rows:
        by_g.setdefault(g, []).append((s, i))
    expect = []
    for g, members in by_g.items():
        members.sort(key=lambda t: (-t[0], t[1]))
        n = len(members)
        for rank, (_, i) in enumerate(members):
            pr = 0.0 if n == 1 else rank / (n - 1)
            if pr <= frac:
                expect.append(i)
    assert got == sorted(expect)


def test_cap_per_key_matches_bruteforce(spark):
    import random

    from lotus_spark.functions.sampling import cap_per_key

    rng = random.Random(13)
    rows = [(f"d{rng.randrange(5)}", i, float(rng.randrange(50)))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["domain", "doc_id", "score"])
    got = sorted(r["doc_id"] for r in
                 cap_per_key(df, "domain", 7, order_by="score",
                             tiebreak="doc_id").collect())
    by_d: dict = {}
    for d, i, s in rows:
        by_d.setdefault(d, []).append((s, i))
    expect = []
    for d, members in by_d.items():
        members.sort(key=lambda t: (-t[0], t[1]))
        expect.extend(i for _, i in members[:7])
    assert got == sorted(expect)


def test_quantile_filter_global_distributed_path(spark):
    """Global quantile_filter with a tiebreak never runs a single-task
    window: plan is TakeOrderedAndProject, and results equal the window
    path bit-for-bit (including percent_rank's float boundary)."""
    import random

    from lotus_spark.functions.sampling import quantile_filter

    rng = random.Random(3)
    rows = [(i, float(rng.randrange(40))) for i in range(211)]
    df = spark.createDataFrame(rows, ["doc_id", "score"])
    for frac in (0.3, 0.5, 1.0, 1 / 3, 2 / 210, 0.0001):
        fast = quantile_filter(df, "score", frac, tiebreak="doc_id")
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        # window-path reference: same call WITHOUT tiebreak can't be used
        # (different order), so replicate via explicit percent_rank
        from pyspark.sql import Window
        from pyspark.sql import functions as F
        w = Window.partitionBy().orderBy(F.desc("score"), F.asc("doc_id"))
        ref = (df.withColumn("__pr", F.percent_rank().over(w))
                 .filter(F.col("__pr") <= frac).drop("__pr"))
        assert sorted(r["doc_id"] for r in fast.collect()) == \
            sorted(r["doc_id"] for r in ref.collect()), frac


def test_quantile_filter_warns_on_single_task_global_window(spark, caplog):
    """Global path WITHOUT a tiebreak falls back to a single-partition
    window — it must warn so the scale hazard is visible; the
    distributed (tiebreak) and grouped paths must stay silent."""
    import logging

    from lotus_spark.functions.sampling import quantile_filter

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(50)], ["doc_id", "score"])
    with caplog.at_level(logging.WARNING,
                         logger="lotus_spark.functions.sampling"):
        quantile_filter(df, "score", 0.5).count()
    assert any("single-partition window" in r.message
               for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING,
                         logger="lotus_spark.functions.sampling"):
        quantile_filter(df, "score", 0.5, tiebreak="doc_id").count()
        quantile_filter(df, "score", 0.5, by="doc_id").count()
    assert not any("single-partition window" in r.message
                   for r in caplog.records)


# ------------------------------------------------------------- hash_split

def test_hash_split_partitions_all_rows_deterministically(spark):
    from lotus_spark.functions.sampling import hash_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000          # total partition, no loss
    assert set(counts) == {"train", "val", "test"}
    assert 1400 < counts["train"] < 1800          # ~80% within tolerance
    assert 100 < counts["val"] + counts["test"] < 600
    again = {r["doc_id"]: r["split"] for r in
             hash_split(df, "doc_id",
                        {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again                         # rerun-stable

    # seed decorrelates: same ids, different assignment pattern
    seeded = {r["doc_id"]: r["split"] for r in
              hash_split(df, "doc_id",
                         {"train": 0.8, "val": 0.1, "test": 0.1},
                         seed=7).collect()}
    assert seeded != first
    # weights normalized: 8/1/1 == .8/.1/.1
    ratio = {r["doc_id"]: r["split"] for r in
             hash_split(df, "doc_id",
                        {"train": 8, "val": 1, "test": 1}).collect()}
    assert ratio == first


def test_hash_split_consistent_across_tables(spark):
    """The same id lands in the same split in every table that carries it
    — the join-consistency property the docstring promises."""
    from lotus_spark.functions.sampling import hash_split

    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    embs = docs.withColumn("extra", F.col("doc_id") * 2)
    w = {"a": 0.5, "b": 0.5}
    d = {r["doc_id"]: r["split"] for r in
         hash_split(docs, "doc_id", w).collect()}
    e = {r["doc_id"]: r["split"] for r in
         hash_split(embs, "doc_id", w).collect()}
    assert d == e


def test_hash_split_validation(spark):
    import pytest

    from lotus_spark.functions.sampling import hash_split

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {})
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": -0.1, "b": 1.1})


def test_hash_split_null_ids_deterministic_but_seed_dependent(spark):
    """NULL ids hash as the (salted) empty string: all NULLs land on ONE
    label — deterministic per seed, but the label is seed-dependent
    (round-5 advice: the docstring must not promise 'first label')."""
    from lotus_spark.functions.sampling import hash_split

    df = spark.createDataFrame(
        [(None,), (None,), (1,)], "doc_id int"
    )
    w = {"train": 0.5, "val": 0.5}
    for seed in (0, 7):
        labels = {r["split"] for r in
                  hash_split(df, "doc_id", w, seed=seed)
                  .filter(F.col("doc_id").isNull()).collect()}
        assert len(labels) == 1               # all NULLs together
        again = {r["split"] for r in
                 hash_split(df, "doc_id", w, seed=seed)
                 .filter(F.col("doc_id").isNull()).collect()}
        assert labels == again                # rerun-stable


# --------------------------------------------------------- mix_to_weights

def test_mix_to_weights_exact_quotas_and_determinism(spark):
    from lotus_spark.functions.sampling import mix_to_weights

    rows = [(i, ["web", "code", "papers"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    out = mix_to_weights(
        df, "domain", {"web": 7, "code": 2, "papers": 1}, total=100,
        id_col="doc_id")
    counts = {r["domain"]: r["n"] for r in
              out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts == {"web": 70, "code": 20, "papers": 10}
    ids1 = sorted(r["doc_id"] for r in out.collect())
    out2 = mix_to_weights(
        df, "domain", {"web": 7, "code": 2, "papers": 1}, total=100,
        id_col="doc_id")
    assert sorted(r["doc_id"] for r in out2.collect()) == ids1

    # shrink-consistency: a smaller draw is a subset of the larger one
    small = mix_to_weights(
        df, "domain", {"web": 7, "code": 2, "papers": 1}, total=50,
        id_col="doc_id")
    assert set(r["doc_id"] for r in small.collect()) <= set(ids1)


def test_mix_to_weights_shortfall_and_unknown_keys(spark):
    from lotus_spark.functions.sampling import mix_to_weights

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "tiny")
                                               for i in range(3)]
    rows += [(2000, "unlisted")]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    out = mix_to_weights(df, "domain", {"big": 1, "tiny": 1}, total=40,
                         id_col="doc_id")
    counts = {r["domain"]: r["n"] for r in
              out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts["big"] == 20
    assert counts["tiny"] == 3            # shortfall surfaced, not hidden
    assert "unlisted" not in counts       # unlisted domains dropped


def test_mix_to_weights_largest_remainder_sums_to_total(spark):
    from lotus_spark.functions.sampling import mix_to_weights

    rows = [(i, f"d{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    # 1/3 each of 100 -> quotas 34/33/33 by largest remainder (tie by key)
    out = mix_to_weights(df, "domain", {"d0": 1, "d1": 1, "d2": 1},
                         total=100, id_col="doc_id")
    counts = {r["domain"]: r["n"] for r in
              out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 100
    assert sorted(counts.values()) == [33, 33, 34]
    assert counts["d0"] == 34             # alphabetical tie-break


# -------------------------------------------------------- perplexity_bucket

def test_perplexity_bucket_orders_rare_docs_into_tail(spark):
    import math

    from lotus_spark.functions.sampling import perplexity_bucket

    common = "the the the the the the"          # all high-count tokens
    rare = "zyx qwv jkl mnb poi uyt"            # all singleton tokens
    mid = "the the the zyx2 the the"
    df = spark.createDataFrame(
        [(1, common), (2, mid), (3, rare)], ["doc_id", "text"])
    out = {r["doc_id"]: (r["ppl_bucket"], r["logppl"])
           for r in perplexity_bucket(df, "text", "doc_id").collect()}
    assert out[1][0] == 1 and out[2][0] == 2 and out[3][0] == 3
    # exact cross-entropy check for the all-common doc: its tokens are
    # all "the" (corpus count 6+5=11), T = 18 tokens -> ln(18) - ln(11)
    assert out[1][1] == round(math.log(18) - math.log(11), 6)
    # rare doc: every token count 1 -> ln(18) - 0
    assert out[3][1] == round(math.log(18), 6)


def test_perplexity_bucket_grouped_and_determinism(spark):
    from lotus_spark.functions.sampling import perplexity_bucket

    rows = []
    for i in range(12):
        lang = "en" if i % 2 == 0 else "de"
        text = " ".join(f"w{j}" for j in range(i + 1))
        rows.append((i, lang, text))
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = perplexity_bucket(
        df, "text", "doc_id", group_col="lang", n_buckets=2)
    got = {(r["lang"], r["ppl_bucket"]): 1 for r in out.collect()}
    # every (group, bucket) cell populated
    assert set(got) == {("en", 1), ("en", 2), ("de", 1), ("de", 2)}
    a = sorted(map(tuple, out.select("doc_id", "ppl_bucket").collect()))
    b = sorted(map(tuple, perplexity_bucket(
        df, "text", "doc_id", group_col="lang",
        n_buckets=2).select("doc_id", "ppl_bucket").collect()))
    assert a == b                                  # rerun-stable
    with __import__("pytest").raises(ValueError):
        perplexity_bucket(df, "text", "doc_id", n_buckets=0)


def test_perplexity_bucket_row_preserving_and_null_text(spark):
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from lotus_spark.functions.sampling import perplexity_bucket

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "   "), (4, None)], schema)
    out = perplexity_bucket(df, "text", "doc_id")
    assert out.count() == 4                 # empty/null docs keep rows
    assert out.filter(F.col("logppl").isNull()).count() == 0
    got = {r["doc_id"]: (r["logppl"], r["ppl_bucket"])
           for r in out.collect()}
    # NULL text scores exactly like the blank docs (the '' token, corpus
    # count 3) — never promoted to bucket 1 by NULLS-FIRST ordering
    assert got[4][0] == got[2][0] == got[3][0]
    # the real-text doc has the rarest tokens -> strictly higher score
    assert got[1][0] > got[4][0]


# --------------------------------------------------------- weighted_sample

def test_weighted_sample_deterministic_and_proportional(spark):
    """A-ES derandomized draw: rerun- and partitioning-stable for a
    fixed seed; across many seeds a 9x-weighted item is included far
    more often than a 1x item (the proportional-probability property);
    zero/negative/NULL weights never selected; n >= eligible rows
    returns them all."""
    from lotus_spark.functions.sampling import weighted_sample

    rows = [(i, 9.0 if i < 10 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "w"])

    a = sorted(r["id"] for r in weighted_sample(df, "w", 20, "id").collect())
    b = sorted(r["id"] for r in
               weighted_sample(df.repartition(13), "w", 20, "id").collect())
    assert a == b and len(a) == 20            # deterministic, exact n

    # A-ES keys are fixed per (data, seed), so samples NEST across n:
    # growing the budget only ever ADDS rows — a pipeline can enlarge a
    # curated draw without reshuffling what it already trained on
    bigger = sorted(r["id"] for r in
                    weighted_sample(df, "w", 35, "id").collect())
    assert set(a) <= set(bigger) and len(bigger) == 35

    heavy_hits = light_hits = 0
    for seed in range(30):
        got = {r["id"] for r in
               weighted_sample(df, "w", 20, "id", seed=seed).collect()}
        heavy_hits += len(got & set(range(10)))
        light_hits += len(got - set(range(10)))
    # 10 heavy items at w=9 vs 90 light at w=1: heavy inclusion rate
    # must dominate light per-item rate by a wide margin
    heavy_rate = heavy_hits / (30 * 10)
    light_rate = light_hits / (30 * 90)
    assert heavy_rate > 3 * light_rate

    # ineligible weights are excluded even when n exceeds eligible rows.
    # NaN must be in this set: Spark sorts NaN above every finite double,
    # so `w > 0` alone passes it and pow(u, 1/NaN) = NaN would win the
    # descending key sort — a NaN-weight row must never be sampled.
    mixed = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 1.0),
         (6, float("nan"))],
        "id int, w double")
    got = sorted(r["id"] for r in
                 weighted_sample(mixed, "w", 10, "id").collect())
    assert got == [1, 5]
    # ...and with n smaller than the eligible pool the NaN row still
    # can't displace a finite-weight row
    got1 = [r["id"] for r in weighted_sample(mixed, "w", 1, "id").collect()]
    assert got1 and got1[0] in (1, 5)

    with pytest.raises(ValueError, match="n must"):
        weighted_sample(df, "w", -1, "id")
    assert weighted_sample(df, "w", 0, "id").count() == 0


def test_shard_for_training_deterministic_uniform_contiguous(spark):
    """shard_for_training: (shard, pos) is a pure function of (id, seed)
    — identical under repartitioning; shards are hash-uniform-ish; pos
    is contiguous 1..count(shard) per shard; a different seed produces a
    different permutation; n_shards=1 degenerates to one global
    pseudo-random total order."""
    from lotus_spark.functions.sharding import shard_for_training

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(400)], ["doc_id", "text"])
    out = shard_for_training(df, "doc_id", 8, seed=0)
    rows = {r["doc_id"]: (r["shard"], r["pos"]) for r in out.collect()}
    assert len(rows) == 400

    # partition-layout independence
    out2 = shard_for_training(df.repartition(13), "doc_id", 8, seed=0)
    assert {r["doc_id"]: (r["shard"], r["pos"])
            for r in out2.collect()} == rows

    # shard range + rough uniformity (expected 50/shard)
    from collections import Counter
    per = Counter(s for s, _ in rows.values())
    assert set(per) <= set(range(8))
    assert all(20 <= per[s] <= 90 for s in per), per

    # pos contiguous per shard
    by_shard = {}
    for s, p in rows.values():
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s

    # the shard-order coordinate is decorrelated from the shard id:
    # a different seed yields a different global permutation
    other = {r["doc_id"]: (r["shard"], r["pos"])
             for r in shard_for_training(df, "doc_id", 8, seed=1).collect()}
    assert other != rows

    # n_shards=1: single shard, pos = a permutation of 1..400 that is
    # NOT the id order (it's hash order)
    one = shard_for_training(df, "doc_id", 1, seed=0).collect()
    assert {r["shard"] for r in one} == {0}
    order = [r["doc_id"] for r in sorted(one, key=lambda r: r["pos"])]
    assert sorted(order) == list(range(400)) and order != list(range(400))

    import pytest
    with pytest.raises(ValueError, match="n_shards"):
        shard_for_training(df, "doc_id", 0)


def test_write_shards_one_sorted_file_per_shard(spark, tmp_path):
    """write_shards materializes the training-export layout: one
    parquet file per shard directory, rows inside each file physically
    ordered by pos (a loader streams without sorting), content equal to
    shard_for_training, and ONE shuffle in the plan (the pos window's
    — no extra repartition exchange)."""
    import os

    from lotus_spark.functions.sharding import (
        shard_for_training, write_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], ["doc_id", "text"])
    path = str(tmp_path / "shards")
    write_shards(df, path, "doc_id", 6, seed=0)

    shard_dirs = sorted(d for d in os.listdir(path)
                        if d.startswith("shard="))
    assert len(shard_dirs) == 6
    want = {(r["doc_id"], r["shard"], r["pos"])
            for r in shard_for_training(df, "doc_id", 6, seed=0).collect()}
    got = set()
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(path, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)          # one file per shard
        shard_id = int(d.split("=")[1])
        import pyarrow.parquet as pq
        t = pq.read_table(os.path.join(path, d, files[0]))
        pos = t.column("pos").to_pylist()
        assert pos == sorted(pos)                   # physically ordered
        for did, p in zip(t.column("doc_id").to_pylist(), pos):
            got.add((did, shard_id, p))
    assert got == want

    # single exchange: the pos window's hashpartitioning(shard) — the
    # write path adds no second shuffle
    from tests.test_plan_shapes import exchanges, formatted_plan

    out = shard_for_training(df, "doc_id", 6, seed=0) \
        .sortWithinPartitions("shard", "pos")
    plan = formatted_plan(out)
    assert len(exchanges(plan)) == 1, plan
