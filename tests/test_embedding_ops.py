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
