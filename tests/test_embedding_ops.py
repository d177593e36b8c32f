import numpy as np
import pytest
from pyspark.sql import functions as F

import lotus_spark as ls
from lotus_spark.functions.vectors import cosine_sim
from lotus_spark.models import HashRM


def test_hash_rm_deterministic():
    rm = HashRM(dim=16, seed=1)
    a = rm(["hello world", "other text"])
    b = rm(["hello world", "other text"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 16)
    norms = np.linalg.norm(a, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-6)


def test_cosine_sim_column(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 0.0])],
        ["a", "b"],
    )
    got = [r["c"] for r in df.select(cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got == [1.0, 0.0, 0.0]  # zero-norm guarded


def test_sem_search_finds_programming(courses_df):
    out = ls.sem_search(
        courses_df, "Course Name", "programming courses", K=2, rm=HashRM(),
        return_scores=True,
    )
    names = {r["Course Name"] for r in out.collect()}
    assert names == {"Introduction to Programming", "Advanced Programming"}
    assert "vec_scores_sim_score" in out.columns


def test_sem_search_respects_prior_filter(courses_df):
    cs = courses_df.filter(F.col("Department") == "Culinary")
    out = ls.sem_search(cs, "Course Name", "programming courses", K=2, rm=HashRM())
    depts = {r["Department"] for r in out.collect()}
    assert depts == {"Culinary"}


def test_sem_sim_join_matches_expected(spark):
    left = spark.createDataFrame(
        [("History of the Atlantic World",), ("Riemannian Geometry",)], ["Course Name"]
    )
    right = spark.createDataFrame([("History",), ("Geometry",)], ["Skill"])
    out = ls.sem_sim_join(left, right, "Course Name", "Skill", K=1, rm=HashRM())
    pairs = {(r["Course Name"], r["Skill"]) for r in out.collect()}
    assert pairs == {
        ("History of the Atlantic World", "History"),
        ("Riemannian Geometry", "Geometry"),
    }
    assert "_scores" in out.columns


def test_sem_cluster_by_separates(spark):
    rows = [("cooking cooking cooking",), ("cooking food food",),
            ("math numbers algebra",), ("math algebra proofs",)]
    df = spark.createDataFrame(rows, ["t"])
    out = ls.sem_cluster_by(df, "t", 2, rm=HashRM(dim=32), seed=7)
    got = {r["t"]: r["cluster_id"] for r in out.collect()}
    assert got["cooking cooking cooking"] == got["cooking food food"]
    assert got["math numbers algebra"] == got["math algebra proofs"]
    assert got["cooking food food"] != got["math algebra proofs"]


def test_deterministic_kmeans_separates_and_is_stable(spark):
    from lotus_spark.functions.kmeans import deterministic_kmeans

    rows = [
        (0, [0.1, 0.1]), (1, [0.12, 0.09]), (2, [0.11, 0.12]),
        (3, [-0.4, -0.4]), (4, [-0.38, -0.41]), (5, [-0.42, -0.39]),
    ]
    df = spark.createDataFrame(rows, ["id", "emb"])
    out1, cent1 = deterministic_kmeans(df, "emb", "id", k=2, iters=3, seed=7)
    got = {r["id"]: r["cluster_id"] for r in out1.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]
    # bit-identical across runs and partitioning (order-independent ints)
    out2, cent2 = deterministic_kmeans(
        df.repartition(5), "emb", "id", k=2, iters=3, seed=7
    )
    assert (cent1 == cent2).all()
    assert {r["id"]: r["cluster_id"] for r in out2.collect()} == got


def test_sem_cluster_by_deterministic_method(spark):
    rows = [(0, "cooking cooking cooking"), (1, "cooking food food"),
            (2, "math numbers algebra"), (3, "math algebra proofs")]
    df = spark.createDataFrame(rows, ["id", "t"])
    # seed chosen so the hash init picks one point from each group (plain
    # Lloyd's shares the reference FAISS-Kmeans property that a bad init
    # can split a natural cluster; no kmeans++ in the reproducible tier)
    out = ls.sem_cluster_by(df, "t", 2, rm=HashRM(dim=32), seed=6,
                            niter=3, method="deterministic", id_col="id")
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert got[0] == got[1] and got[2] == got[3] and got[0] != got[2]

    with pytest.raises(ValueError, match="id_col"):
        ls.sem_cluster_by(df, "t", 2, rm=HashRM(dim=32),
                          method="deterministic")


def test_sem_dedup_removes_near_dupes(spark):
    rows = [(0, "the spark engine is fast"), (1, "the spark engine is fast"),
            (2, "the spark engine is quick"), (3, "completely different topic entirely")]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = ls.sem_dedup(df, "t", threshold=0.8, rm=HashRM(dim=32), id_col="id")
    kept = sorted(r["id"] for r in out.collect())
    assert 3 in kept
    assert 0 in kept and 1 not in kept  # exact dup removed, min id kept
    assert len(kept) < 4


def test_sem_partition_by_adds_column(spark):
    df = spark.createDataFrame([("cooking food",), ("math proofs",)], ["t"])
    out = ls.sem_partition_by(df, col="t", ncentroids=2, rm=HashRM(dim=16))
    assert "_lotus_partition_id" in out.columns
    assert out.count() == 2


def test_sem_index_roundtrip(spark, tmp_path, courses_df):
    from lotus_spark.operators.sem_index import read_index
    from lotus_spark.session import SemanticSession

    sess = SemanticSession(spark=spark)
    path = str(tmp_path / "idx")
    ls.sem_index(courses_df, "Course Name", path, rm=HashRM(), session=sess)
    idx = read_index(spark, path)
    assert idx.count() == courses_df.count()
    assert set(idx.columns) == {"value", "_lotus_emb"}
    assert sess.get_index("Course Name").path == path


def test_sem_search_rerank_path(courses_df):
    """n_rerank + reranker reorders the candidate set through the
    Reranker protocol (query, docs, K) -> indices."""
    from lotus_spark.models import HashReranker

    import lotus_spark as ls
    from lotus_spark.models import HashRM

    out = ls.sem_search(
        courses_df, "Course Name", "Advanced Programming", K=4,
        rm=HashRM(dim=64), n_rerank=2, reranker=HashReranker(dim=64),
    )
    rows = out.collect()
    assert len(rows) == 2
    assert rows[0]["Course Name"] == "Advanced Programming"


def test_broadcast_vector_index_and_ann_join(spark):
    import numpy as np

    from lotus_spark.models.vs import BroadcastVectorIndex, ann_join

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.1, 0.9])]
    df = spark.createDataFrame(rows, ["id", "emb"])
    ix = BroadcastVectorIndex.build(df, "id", "emb")
    assert len(ix) == 4
    ids, scores = ix.search(np.array([[1.0, 0.0]]), K=2)
    assert ids[0].tolist() == [1, 2]
    assert scores[0][0] == pytest.approx(1.0)

    left = spark.createDataFrame([(10, [1.0, 0.05]), (20, [0.0, 1.0])],
                                 ["lid", "emb"])
    out = ann_join(left, ix, "emb", K=2)
    got = {(r["lid"], r["_rank"]): r["match_id"] for r in out.collect()}
    assert got[(10, 1)] == 1 and got[(20, 1)] == 3

    # K larger than the index clamps; empty index returns no neighbors
    ids3, _ = ix.search(np.array([[1.0, 0.0]]), K=99)
    assert ids3.shape[1] == 4


def test_sem_sim_join_broadcast_ann_matches_crossjoin(spark):
    import lotus_spark as ls
    from lotus_spark.models import HashRM

    left = spark.createDataFrame(
        [("apple pie",), ("c programming",)], ["q"])
    right = spark.createDataFrame(
        [("apple tart recipe",), ("programming in c",), ("river hike",)], ["d"])
    kw = dict(K=2, rm=HashRM(dim=64), tie_break="d", return_scores=True)
    a = ls.sem_sim_join(left, right, "q", "d", strategy="crossjoin", **kw)
    b = ls.sem_sim_join(left, right, "q", "d", strategy="broadcast_ann", **kw)
    c = ls.sem_sim_join(left, right, "q", "d", strategy="broadcast_exact", **kw)
    pa = {(r["q"], r["d"]): round(r["_scores"], 5) for r in a.collect()}
    pb = {(r["q"], r["d"]): round(r["_scores"], 5) for r in b.collect()}
    pc = {(r["q"], r["d"]): r["_scores"] for r in c.collect()}
    assert pa == pb
    # broadcast_exact is bit-identical to the crossjoin tier, not just approx
    pa_raw = {(r["q"], r["d"]): r["_scores"] for r in a.collect()}
    assert pa_raw == pc
    assert sorted(a.columns) == sorted(c.columns)

    with pytest.raises(ValueError, match="strategy"):
        ls.sem_sim_join(left, right, "q", "d", strategy="faiss9000", **kw)


def _dedup_fixture(spark, n_clusters=6, per=4, dim=16, seed=3):
    """Tight duplicate clusters (cosine ≈ 1 within, ≈ 0 across)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_clusters, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        for k in range(per):
            v = base[c] + 0.001 * rng.normal(size=dim)
            rows.append((c * per + k, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["id", "emb"])


def test_sem_dedup_exact_plan_has_no_cartesian(spark):
    """The exact tier must never plan a BroadcastNestedLoop/cartesian —
    pair space is covered by chunk-pair applyInPandas tasks (VERDICT #1)."""
    df = _dedup_fixture(spark)
    out = ls.sem_dedup(df, "emb", threshold=0.9, id_col="id",
                       emb_col="emb", strategy="exact", max_block_rows=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    kept = sorted(r["id"] for r in out.collect())
    assert kept == [0, 4, 8, 12, 16, 20]  # min id per cluster


def test_sem_dedup_lsh_matches_exact_on_tight_clusters(spark):
    df = _dedup_fixture(spark)
    exact = sorted(r["id"] for r in ls.sem_dedup(
        df, "emb", threshold=0.9, id_col="id", emb_col="emb",
        strategy="exact").collect())
    lsh = sorted(r["id"] for r in ls.sem_dedup(
        df, "emb", threshold=0.9, id_col="id", emb_col="emb",
        strategy="lsh", max_block_rows=8).collect())
    assert lsh == exact == [0, 4, 8, 12, 16, 20]


def test_sem_dedup_auto_picks_lsh_above_exact_max(spark):
    df = _dedup_fixture(spark)
    # exact_max below n forces the LSH tier via the bounded count
    out = ls.sem_dedup(df, "emb", threshold=0.9, id_col="id",
                       emb_col="emb", strategy="auto", exact_max=10)
    assert sorted(r["id"] for r in out.collect()) == [0, 4, 8, 12, 16, 20]
    with pytest.raises(ValueError, match="strategy"):
        ls.sem_dedup(df, "emb", threshold=0.9, id_col="id",
                     emb_col="emb", strategy="bogus")


def test_lsh_candidate_pairs_auto_planes(spark):
    """n_planes="auto" sizes bucket count from the row count (clamped
    log2(n/256)) and is exactly the explicit-planes plan for that value —
    the self-sizing that keeps within-bucket verify work linear as the
    corpus grows (see tools/scale_probe.py)."""
    from lotus_spark.functions.dedup import lsh_candidate_pairs

    df = _dedup_fixture(spark)  # 21 rows -> auto = clamp floor = 4 planes
    key = lambda r: (r["a"], r["b"])  # noqa: E731
    auto = sorted(map(key, lsh_candidate_pairs(
        df, "id", "emb", 0.9, n_planes="auto").collect()))
    explicit = sorted(map(key, lsh_candidate_pairs(
        df, "id", "emb", 0.9, n_planes=4).collect()))
    assert auto == explicit and auto  # same plan, non-empty recall


def test_scored_pairs_chunked_equals_single_block(spark):
    from lotus_spark.functions.dedup import scored_pairs

    df = _dedup_fixture(spark, n_clusters=3, per=5)
    one = scored_pairs(df, "id", "emb", 0.9).collect()
    many = scored_pairs(df, "id", "emb", 0.9, max_block_rows=4).collect()
    key = lambda r: (r["a"], r["b"])  # noqa: E731
    assert sorted(map(key, many)) == sorted(map(key, one))
    # scores bit-identical regardless of chunking (dim-ordered fold)
    s1 = {key(r): r["score"] for r in one}
    for r in many:
        assert s1[key(r)] == r["score"]


def test_connected_components_scores_edges_once(spark):
    """The edge subtree (pair scoring — the expensive stage) must execute
    exactly once: persisted before the size-probe count, so collect / the
    propagation loop hit the cache (round-3 verdict item 5)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from lotus_spark.operators.sem_dedup import connected_components_edges

    for max_driver in (1_000_000, 2):  # driver union-find / min-label path
        calls = spark.sparkContext.accumulator(0)

        def bump(x, _calls=calls):
            _calls.add(1)
            return x

        bump_udf = F.udf(bump, LongType())
        df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["src", "dst"])
        edges = df.select(
            bump_udf("src").alias("src"), F.col("dst").cast("long")
        )
        out = connected_components_edges(edges, max_driver_edges=max_driver)
        comp = {r["id"]: r["component"] for r in out.collect()}
        assert comp[3] == 1 and comp[2] == 1 and comp[11] == 10
        assert calls.value == 3, (max_driver, calls.value)


def test_sem_cluster_by_sampled_training(spark):
    """train_sample bounds TRAINING only: assignment covers every row,
    cluster count is preserved, and the deterministic tier's result
    equals training on the physically pre-filtered rows (both tiers);
    the mllib tier also assigns all rows from a sample-trained model."""
    import numpy as np

    from lotus_spark.functions.kmeans import train_sample_predicate
    from lotus_spark.functions.text import MOD
    from lotus_spark.operators.sem_cluster_by import sem_cluster_by

    rng = np.random.RandomState(31)
    vecs = rng.randn(120, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        ["vec_id", "embedding"])
    ts = (7, MOD // 2)
    for method in ("deterministic", "mllib"):
        out = sem_cluster_by(df, "embedding", 4, emb_col="embedding",
                             niter=3, method=method, id_col="vec_id",
                             train_sample=ts)
        got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
        assert len(got) == 120                       # every row assigned
        assert len(set(got.values())) <= 4
    # deterministic tier: sampled == prefiltered training, row for row
    pred = train_sample_predicate("vec_id", *ts)
    from lotus_spark.functions.kmeans import deterministic_kmeans

    _, cent_s = deterministic_kmeans(df, "embedding", "vec_id", 4,
                                     iters=3, seed=42, train_filter=pred)
    _, cent_f = deterministic_kmeans(df.filter(pred), "embedding",
                                     "vec_id", 4, iters=3, seed=42)
    assert cent_s.tolist() == cent_f.tolist()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="id_col"):
        sem_cluster_by(df, "embedding", 4, emb_col="embedding",
                       method="mllib", train_sample=ts)


def test_broadcast_pq_index_matches_jvm_adc(spark):
    """BroadcastPQIndex.search is the numpy twin of knn_topk_pq's ADC
    scan: same codes, same quantized-query lookup tables, so ids AND
    integer distances match the JVM literal-LUT plan exactly."""
    import numpy as np

    from lotus_spark.functions.ann import knn_topk_pq, pq_index
    from lotus_spark.models.vs import BroadcastPQIndex

    rng = np.random.RandomState(41)
    vecs = rng.randn(70, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(70)],
        ["vec_id", "embedding"])
    enc, books = pq_index(df, "embedding", "vec_id", m=4, nbits=2, seed=5)
    ix = BroadcastPQIndex.build(enc, "vec_id", "pq_codes", books)
    assert len(ix) == 70
    # codes broadcast at 1 B/code for nbits<=8 — the whole point of the
    # compressed tier; int64 here would 8x the driver/broadcast bytes
    assert ix.codes.dtype == np.uint8

    for qi in (0, 7, 33):
        q = [float(x) for x in vecs[qi]]
        jvm = [(r["vec_id"], r["pq_dist"]) for r in
               knn_topk_pq(enc, books, q, k=6, id_col="vec_id").collect()]
        ids, dists = ix.search(np.asarray(q), K=6)
        assert list(zip(ids[0].tolist(), dists[0].tolist())) == jvm

    # batch of queries in one call
    ids, dists = ix.search(vecs[:5].astype(np.float64), K=3)
    assert ids.shape == (5, 3) and dists.shape == (5, 3)


def test_ann_join_pq_exact_with_full_candidates(spark):
    """ann_join_pq with candidates=n degenerates to the EXACT K-NN join
    (the rerank sees every row), matching brute-force per-query cosine;
    with a small candidate budget it still returns K ranked rows per
    left id with descending scores."""
    import numpy as np

    from lotus_spark.functions.ann import knn_topk, pq_index
    from lotus_spark.models.vs import BroadcastPQIndex, ann_join_pq

    rng = np.random.RandomState(43)
    vecs = rng.randn(80, 8).astype("float32")
    right = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        ["vec_id", "embedding"])
    left = spark.createDataFrame(
        [(100 + j, [float(x) for x in vecs[j * 11]]) for j in range(4)],
        ["qid", "embedding"])
    enc, books = pq_index(right, "embedding", "vec_id", m=4, nbits=2,
                          seed=5)
    ix = BroadcastPQIndex.build(enc, "vec_id", "pq_codes", books)

    out = ann_join_pq(left, right, ix, "qid", "embedding", "vec_id",
                      "embedding", K=3, candidates=80)
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append(
            (r["_rank"], r["match_id"], r["_scores"]))
    assert set(got) == {100, 101, 102, 103}
    for j in range(4):
        q = [float(x) for x in vecs[j * 11]]
        exact = [(r["vec_id"], round(r["score"], 6)) for r in
                 knn_topk(right, "embedding", q, k=3,
                          id_col="vec_id").collect()]
        mine = [(m, s) for _, m, s in sorted(got[100 + j])]
        assert mine == exact
        assert mine[0][0] == j * 11          # self-match first

    # bounded candidate budget: K ranked rows per left id, scores desc
    out2 = ann_join_pq(left, right, ix, "qid", "embedding", "vec_id",
                       "embedding", K=3, candidates=12)
    per = {}
    for r in out2.collect():
        per.setdefault(r["qid"], []).append((r["_rank"], r["_scores"]))
    for qid, rows in per.items():
        rows.sort()
        assert [rk for rk, _ in rows] == [1, 2, 3]
        assert all(a[1] >= b[1] for a, b in zip(rows, rows[1:]))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="candidates"):
        ann_join_pq(left, right, ix, "qid", "embedding", "vec_id",
                    "embedding", K=5, candidates=3)


def test_sem_sim_join_broadcast_pq_strategy(spark):
    """The compressed sim-join tier: with a full candidate budget the
    PQ strategy returns the same neighbor sets and (rounded) scores as
    the exact broadcast tier; the right side is multi-partition, so the
    generated ids exercise the int64-safe init hash (ANSI mode)."""
    import numpy as np

    from lotus_spark.operators.sem_sim_join import sem_sim_join

    rng = np.random.RandomState(47)
    vecs = rng.randn(100, 8).astype("float32")
    right = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)],
        ["rid", "remb"]).repartition(7)
    left = spark.createDataFrame(
        [(200 + j, [float(x) for x in vecs[j * 13]]) for j in range(4)],
        ["qid", "lemb"])

    exact = sem_sim_join(left, right, "lemb", "remb", K=3,
                         left_emb_col="lemb", right_emb_col="remb",
                         tie_break="rid", strategy="broadcast_exact")
    pq = sem_sim_join(left, right, "lemb", "remb", K=3,
                      left_emb_col="lemb", right_emb_col="remb",
                      strategy="broadcast_pq", pq_candidates=100)

    def by_q(rows):
        d = {}
        for r in rows:
            d.setdefault(r["qid"], []).append(
                (round(r["_scores"], 6), r["rid"]))
        return {k: sorted(v, reverse=True) for k, v in d.items()}

    e, p = by_q(exact.collect()), by_q(pq.collect())
    assert set(e) == set(p) == {200, 201, 202, 203}
    for q in e:
        assert e[q] == p[q], q
    # self-match leads with score 1.0
    for j in range(4):
        assert p[200 + j][0] == (1.0, j * 13)

    with pytest.raises(ValueError, match="strategy"):
        sem_sim_join(left, right, "lemb", "remb",
                     left_emb_col="lemb", right_emb_col="remb",
                     strategy="nope")


def test_sem_sim_join_auto_escalates_exact_pq_crossjoin(spark):
    """auto picks broadcast_exact when the raw right side fits the
    broadcast budget, broadcast_pq when only its PQ codes would, and
    crossjoin beyond that — verified with tiny thresholds by comparing
    to the explicitly-requested strategies (all agree on values here)."""
    import numpy as np

    from lotus_spark.operators.sem_sim_join import sem_sim_join

    rng = np.random.RandomState(53)
    vecs = rng.randn(40, 8).astype("float32")
    right = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        ["rid", "remb"])
    left = spark.createDataFrame(
        [(100, [float(x) for x in vecs[3]])], ["qid", "lemb"])

    def run(**kw):
        out = sem_sim_join(left, right, "lemb", "remb", K=3,
                           left_emb_col="lemb", right_emb_col="remb",
                           tie_break="rid", **kw)
        return sorted((r["rid"], round(r["_scores"], 6))
                      for r in out.collect())

    exact = run(strategy="broadcast_exact")
    # raw fits: 40 <= 100 -> broadcast_exact
    assert run(strategy="auto", broadcast_max_rows=100) == exact
    # the pq tier is sized by measured bytes/row: d=8 -> exact tier
    # ships 8*4+8=40 B/row, pq ships 8+8=16 B/row -> ratio 40//16 = 2.
    # raw doesn't fit (40 > 20) but codes do (40 <= 2*20) -> broadcast_pq;
    # with a full candidate budget the rerank makes it value-equal
    pq = run(strategy="auto", broadcast_max_rows=20, pq_candidates=40)
    assert pq == exact
    # beyond even the code budget (40 > 2*19) -> crossjoin (also exact)
    assert run(strategy="auto", broadcast_max_rows=19) == exact


def test_sem_sim_join_broadcast_pq_honors_tie_break(spark):
    """tie_break reaches the broadcast_pq rerank window (round-7: it
    was silently ignored, leaving ties on an internal row id): with
    duplicated right vectors (exact score ties) the pq tier picks the
    same winners as broadcast_exact, ordered by the tie column."""
    import numpy as np

    from lotus_spark.operators.sem_sim_join import sem_sim_join

    rng = np.random.RandomState(11)
    base = rng.randn(10, 8).astype("float64")
    # rows 100..109 duplicate rows 0..9's vectors -> guaranteed ties
    rows = [(i, [float(x) for x in base[i % 10]]) for i in range(10)]
    rows += [(100 + i, [float(x) for x in base[i]]) for i in range(10)]
    right = spark.createDataFrame(rows, ["rid", "remb"])
    left = spark.createDataFrame(
        [(7, [float(x) for x in base[3]])], ["qid", "lemb"])

    def run(strategy, **kw):
        out = sem_sim_join(left, right, "lemb", "remb", K=4,
                           left_emb_col="lemb", right_emb_col="remb",
                           tie_break="rid", strategy=strategy, **kw)
        return [(r["rid"], round(r["_scores"], 6)) for r in
                sorted(out.collect(), key=lambda r: (-r["_scores"], r["rid"]))]

    exact = run("broadcast_exact")
    pq = run("broadcast_pq", pq_candidates=20)
    assert pq == exact
    # the tie really exists and resolves low-rid first: rid 3 and 103
    # carry the same vector, both must appear before any other score
    top2 = {rid for rid, _ in exact[:2]}
    assert top2 == {3, 103}


def test_ann_join_ivf_cell_partitioned(spark):
    """The no-broadcast ANN join tier: with n_probe = n_cells the probe
    is exhaustive, so results equal the exact per-query top-K; with a
    partial probe every returned match lives in one of the query's
    probed cells (computed independently via rank_cells_quantized) and
    results are partitioning-invariant."""
    import numpy as np

    from lotus_spark.functions.ann import (
        ann_join_ivf, ivf_index, knn_topk, rank_cells_quantized,
    )

    rng = np.random.RandomState(31)
    vecs = rng.randn(120, 8).astype("float64")
    right = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        ["rid", "remb"])
    left = spark.createDataFrame(
        [(200 + j, [float(x) for x in vecs[j * 17]]) for j in range(4)],
        ["qid", "lemb"])

    # exhaustive probe == exact brute force per query
    full = ann_join_ivf(left, right, "qid", "lemb", "rid", "remb",
                        K=3, n_cells=4, n_probe=4, seed=9)
    got = {}
    for r in full.collect():
        got.setdefault(r["qid"], []).append((r["_rank"], r["match_id"]))
    for j in range(4):
        q = [float(x) for x in vecs[j * 17]]
        exact = [r["rid"] for r in
                 knn_topk(right, "remb", q, k=3, id_col="rid").collect()]
        assert [m for _, m in sorted(got[200 + j])] == exact
        assert exact[0] == j * 17          # self-match leads

    # partial probe: membership respects the independently-ranked cells
    part = ann_join_ivf(left, right, "qid", "lemb", "rid", "remb",
                        K=3, n_cells=4, n_probe=2, seed=9)
    indexed, cents = ivf_index(right, "remb", n_cells=4, seed=9,
                               method="deterministic", id_col="rid")
    cell_of = {r["rid"]: r["__ivf_cell"] for r in indexed.collect()}
    rows = part.collect()
    assert rows
    for r in rows:
        q = [float(x) for x in vecs[(r["qid"] - 200) * 17]]
        probed = rank_cells_quantized(cents, q, 2)
        assert cell_of[r["match_id"]] in probed

    # partitioning-invariant (deterministic quantizers end to end)
    again = ann_join_ivf(left.repartition(7), right.repartition(13),
                         "qid", "lemb", "rid", "remb",
                         K=3, n_cells=4, n_probe=2, seed=9)
    key = lambda rs: sorted((r["qid"], r["_rank"], r["match_id"],
                             r["_scores"]) for r in rs)
    assert key(again.collect()) == key(rows)


def test_sem_sim_join_ivf_cells_strategy(spark):
    """The user-facing no-broadcast tier: with an exhaustive probe the
    ivf_cells strategy matches broadcast_exact (payload columns, scores,
    tie order); a partial probe still returns <= K ranked rows per left
    row with descending scores."""
    import numpy as np

    from lotus_spark.operators.sem_sim_join import sem_sim_join

    rng = np.random.RandomState(13)
    vecs = rng.randn(60, 8).astype("float64")
    right = spark.createDataFrame(
        [(i, f"doc{i}", [float(x) for x in vecs[i]]) for i in range(60)],
        ["rid", "payload", "remb"])
    left = spark.createDataFrame(
        [(100 + j, [float(x) for x in vecs[j * 9]]) for j in range(3)],
        ["qid", "lemb"])

    def run(**kw):
        out = sem_sim_join(left, right, "lemb", "remb", K=3,
                           left_emb_col="lemb", right_emb_col="remb",
                           tie_break="rid", **kw)
        return sorted((r["qid"], r["rid"], r["payload"],
                       round(r["_scores"], 6)) for r in out.collect())

    exact = run(strategy="broadcast_exact")
    full_probe = run(strategy="ivf_cells", ivf_n_cells=4, ivf_n_probe=4)
    assert full_probe == exact

    part = run(strategy="ivf_cells", ivf_n_cells=4, ivf_n_probe=1)
    per = {}
    for qid, rid, _, score in part:
        per.setdefault(qid, []).append(score)
    assert set(per) <= {100, 101, 102} and per
    for scores in per.values():
        assert len(scores) <= 3
    # the self-match cell is always probed first: rank-1 is the query row
    top = {(q, r) for q, r, _, s in part if s == 1.0}
    assert top == {(100 + j, j * 9) for j in range(3)}


def test_ann_join_ivf_null_embeddings_and_tie_break(spark):
    """Round-7 review fixes pinned: (a) NULL left embeddings probe no
    cells (row silently contributes no candidates) instead of crashing
    the pandas UDF batch; (b) tie_col reaches ann_join_ivf's rank
    window, so with duplicated right vectors the ivf_cells strategy
    matches broadcast_exact's tie order; (c) a left-only tie_break name
    raises a clear error in the pq/ivf tiers instead of failing deep in
    the join."""
    import numpy as np
    import pytest as _pytest

    from lotus_spark.functions.ann import ann_join_ivf
    from lotus_spark.operators.sem_sim_join import sem_sim_join

    rng = np.random.RandomState(3)
    base = rng.randn(8, 8).astype("float64")
    rows = [(i, [float(x) for x in base[i % 8]]) for i in range(16)]
    right = spark.createDataFrame(rows, ["rid", "remb"])
    left = spark.createDataFrame(
        [(100, [float(x) for x in base[2]]), (101, None)],
        "qid long, lemb array<double>")

    out = ann_join_ivf(left, right, "qid", "lemb", "rid", "remb",
                       K=4, n_cells=2, n_probe=2, seed=5, tie_col="rid")
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append((r["_rank"], r["match_id"]))
    assert 101 not in got                  # NULL query: no candidates
    # rid 2 and 10 share a vector: the tie resolves low-rid first
    ranked = [m for _, m in sorted(got[100])]
    assert ranked[:2] == [2, 10]

    # sem_sim_join ivf_cells parity with exact under ties
    def run(strategy):
        out = sem_sim_join(
            left.filter("qid = 100"), right, "lemb", "remb", K=4,
            left_emb_col="lemb", right_emb_col="remb", tie_break="rid",
            strategy=strategy,
            **({"ivf_n_cells": 2, "ivf_n_probe": 2}
               if strategy == "ivf_cells" else {}))
        return sorted((r["rid"], round(r["_scores"], 6))
                      for r in out.collect())

    assert run("ivf_cells") == run("broadcast_exact")

    with _pytest.raises(ValueError, match="RIGHT-side"):
        sem_sim_join(left, right, "lemb", "remb", K=2,
                     left_emb_col="lemb", right_emb_col="remb",
                     tie_break="qid", strategy="ivf_cells").collect()


def test_sem_sim_join_auto_tolerates_null_first_embedding(spark):
    """Review fix pinned: auto's dim probe skips NULL embeddings
    (F.size(NULL) is NULL; int(None) crashed before) — a right side
    whose FIRST row carries a NULL embedding still escalates correctly
    and the NULL row simply never matches."""
    import numpy as np

    from lotus_spark.operators.sem_sim_join import sem_sim_join

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 8).astype("float64")
    rows = [(0, None)] + [
        (i, [float(x) for x in vecs[i]]) for i in range(1, 30)]
    right = spark.createDataFrame(rows, "rid long, remb array<double>")
    left = spark.createDataFrame(
        [(100, [float(x) for x in vecs[5]])], ["qid", "lemb"])

    # force the escalation path (raw doesn't fit) so the d-probe runs
    out = sem_sim_join(left, right, "lemb", "remb", K=2,
                       left_emb_col="lemb", right_emb_col="remb",
                       tie_break="rid", strategy="auto",
                       broadcast_max_rows=10, pq_candidates=30)
    got = sorted(r["rid"] for r in out.collect())
    assert len(got) == 2 and 0 not in got
    assert 5 in got  # exact self-match survives the pq tier


def test_sem_sim_join_auto_all_null_embeddings_fails_loudly(spark):
    """Review fix pinned: when the whole (bounded) right side has NULL
    embeddings, the auto dim-probe's d=64 fallback routes to the PQ
    tier, which raises 'no non-NULL embeddings' at its own dim probe —
    instead of the old d=0 path silently demoting to a crossjoin of
    NULL-score pairs (and instead of the TypeError the pq tier's
    unguarded probe used to throw on a NULL first row)."""
    import pytest

    from lotus_spark.operators.sem_sim_join import sem_sim_join

    right = spark.createDataFrame(
        [(i, None) for i in range(30)], "rid long, remb array<double>")
    left = spark.createDataFrame(
        [(100, [1.0] * 8)], ["qid", "lemb"])
    with pytest.raises(ValueError, match="no non-NULL embeddings"):
        sem_sim_join(left, right, "lemb", "remb", K=2,
                     left_emb_col="lemb", right_emb_col="remb",
                     tie_break="rid", strategy="auto",
                     broadcast_max_rows=10).collect()


def test_sem_dedup_exact_collapse_and_corners(spark):
    """r10 hot-group guard in sem_dedup: exact-equal embeddings collapse
    to their min-id representative before the pair stage (and, on the
    text path, before the RM embeds the copies). Corners pinned: the
    ZERO-norm group does NOT collapse (the uncollapsed pipeline scores
    cosine(0,0)=0, never > threshold), near-dups still merge through a
    group's representative, and threshold=1.0 disables the collapse
    entirely (strict >, so even exact copies are not duplicates)."""
    from lotus_spark.operators.sem_dedup import sem_dedup

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),          # exact dup of 1
        (3, [0.999, 0.01]),       # near-dup of the group's rep
        (40, [0.0, 0.0]),
        (41, [0.0, 0.0]),         # zero-norm twins: both kept
        (50, [0.0, 1.0]),
        (51, [0.0, 1.0]),         # exact dup of 50
    ]
    df = spark.createDataFrame(rows, "doc_id long, emb array<double>")
    kept = {r["doc_id"] for r in sem_dedup(
        df, "emb", threshold=0.8, id_col="doc_id", emb_col="emb",
        strategy="exact").collect()}
    assert kept == {1, 40, 41, 50}

    kept_strict = {r["doc_id"] for r in sem_dedup(
        df, "emb", threshold=1.0, id_col="doc_id", emb_col="emb",
        strategy="exact").collect()}
    assert kept_strict == {1, 2, 3, 40, 41, 50, 51}


def test_sem_sim_join_ivfpq_strategy(spark):
    """r10-verdict item 7: ann_join_ivfpq wired into sem_sim_join as
    the ladder-top 'ivfpq' tier. At full knobs (probe == cells, auto
    rerank budget >= candidates) it matches broadcast_exact and
    ivf_cells exactly; a partial probe returns <= K ranked rows; a
    tie_break raises loudly (the tier breaks ties on the internal right
    id)."""
    import numpy as np
    import pytest

    from lotus_spark.operators.sem_sim_join import sem_sim_join

    rng = np.random.RandomState(17)
    vecs = rng.randn(60, 8).astype("float64")
    right = spark.createDataFrame(
        [(i, f"doc{i}", [float(x) for x in vecs[i]]) for i in range(60)],
        ["rid", "payload", "remb"])
    left = spark.createDataFrame(
        [(100 + j, [float(x) for x in vecs[j * 9]]) for j in range(3)],
        ["qid", "lemb"])

    def run(**kw):
        out = sem_sim_join(left, right, "lemb", "remb", K=3,
                           left_emb_col="lemb", right_emb_col="remb",
                           **kw)
        return sorted((r["qid"], r["rid"], r["payload"],
                       round(r["_scores"], 6)) for r in out.collect())

    exact = run(strategy="broadcast_exact")
    ivf = run(strategy="ivf_cells", ivf_n_cells=4, ivf_n_probe=4)
    ivfpq = run(strategy="ivfpq", ivf_n_cells=4, ivf_n_probe=4)
    assert ivfpq == ivf == exact

    part = run(strategy="ivfpq", ivf_n_cells=4, ivf_n_probe=1)
    per = {}
    for qid, rid, _, score in part:
        per.setdefault(qid, []).append(score)
    assert per and all(len(s) <= 3 for s in per.values())
    # the self-match cell is always probed first: score-1 pairs are the
    # query rows themselves
    top = {(q, r) for q, r, _, s in part if s == 1.0}
    assert top == {(100 + j, j * 9) for j in range(3)}

    with pytest.raises(ValueError, match="tie_break"):
        run(strategy="ivfpq", tie_break="rid")


def test_sem_sim_join_auto_approx_escalates_to_ivfpq(spark):
    """auto_approx=True lets the auto ladder escalate past the PQ code
    budget to the bounded-shuffle ivfpq tier instead of the
    pair-exploding crossjoin; the default (False) keeps auto exact.
    Here the default knobs fully probe the tiny right side, so the
    approximate tier's answers are value-equal to exact."""
    import numpy as np

    from lotus_spark.operators.sem_sim_join import sem_sim_join

    rng = np.random.RandomState(53)
    vecs = rng.randn(40, 8).astype("float32")
    right = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        ["rid", "remb"])
    left = spark.createDataFrame(
        [(100, [float(x) for x in vecs[3]])], ["qid", "lemb"])

    def run(**kw):
        out = sem_sim_join(left, right, "lemb", "remb", K=3,
                           left_emb_col="lemb", right_emb_col="remb",
                           **kw)
        return sorted((r["rid"], round(r["_scores"], 6))
                      for r in out.collect())

    exact = run(strategy="broadcast_exact")
    # beyond the code budget (40 > 2*19): default auto stays exact via
    # crossjoin; auto_approx opts into the ivfpq plan (n_cells auto ~
    # sqrt(40), n_probe 8 >= cells -> full probe -> same values)
    assert run(strategy="auto", broadcast_max_rows=19) == exact
    assert run(strategy="auto", broadcast_max_rows=19,
               auto_approx=True) == exact


def test_sem_sim_join_ivfpq_matches_duckdb_oracle(spark):
    """The r12-staged operator-level ivfpq row (__spark_entry__.
    q_sem_sim_join_ivfpq): full-knob ivfpq tier == the exact-KNN SQL
    oracle (_SQL_SIM_JOIN), driver-canonical compare."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    odf = con.execute(entry._SQL_SIM_JOIN).df()
    sdf = entry.q_sem_sim_join_ivfpq(spark, sf).toPandas()

    def canon(pdf):
        pdf = pdf[sorted(pdf.columns)].copy()
        for c in pdf.columns:
            if str(pdf[c].dtype).startswith("float"):
                pdf[c] = pdf[c].astype(float).round(6)
            pdf[c] = pdf[c].astype(str)
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)
