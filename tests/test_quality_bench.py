"""nDCG metrics + the gated retrieval-quality benchmark harness.

The real-model tier (sentence-transformers) mirrors the reference's
paper-regression baselines
(``/root/reference/benchmarks/reranking/test_paper_results.py:228-238``)
and auto-skips where the model isn't installed; the metric math and the
harness plumbing are verified hermetically with HashRM.
"""

import math
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lotus_spark.functions.evalmetrics import ndcg_at_k, ndcg_at_k_df


def test_ndcg_at_k_hand_computed():
    # perfect ranking of two relevant docs
    assert ndcg_at_k([1, 2], {1: 1, 2: 1}) == pytest.approx(1.0)
    # relevant doc at rank 2 of 2, one relevant total:
    # dcg = 1/log2(3); idcg = 1 -> ndcg = 1/log2(3)
    assert ndcg_at_k([9, 1], {1: 1}) == pytest.approx(1 / math.log2(3))
    # graded relevance: ideal order (3, 1); retrieved (1, 3) swapped
    got = ndcg_at_k([1, 2], {1: 1, 2: 3})
    dcg = (2**1 - 1) / math.log2(2) + (2**3 - 1) / math.log2(3)
    idcg = (2**3 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3)
    assert got == pytest.approx(dcg / idcg)
    # no relevant docs at all -> 0 by convention
    assert ndcg_at_k([1, 2], {}) == 0.0
    # k cuts the ranking
    assert ndcg_at_k([9, 1], {1: 1}, k=1) == 0.0


def test_ndcg_df_matches_pure_python(spark):
    rng = random.Random(7)
    n_q, n_docs, k = 8, 40, 5
    results, qrels = [], []
    rels_by_q: dict[int, dict[int, int]] = {}
    ranked_by_q: dict[int, list[int]] = {}
    for q in range(n_q):
        rels = {d: rng.randrange(0, 3)
                for d in rng.sample(range(n_docs), 10)}
        rels = {d: r for d, r in rels.items() if r > 0}
        for d, r in rels.items():
            qrels.append((q, d, r))
        scored = [(d, rng.random()) for d in rng.sample(range(n_docs), 15)]
        for d, s in scored:
            results.append((q, d, s))
        # replicate the df's ordering: score DESC, doc_id ASC
        ranked = [d for d, _ in
                  sorted(scored, key=lambda t: (-t[1], t[0]))]
        if rels:  # queries without positives are excluded by convention
            rels_by_q[q] = rels
            ranked_by_q[q] = ranked
    rdf = spark.createDataFrame(results, ["query_id", "doc_id", "score"])
    qdf = spark.createDataFrame(qrels, ["query_id", "doc_id", "rel"])
    got = {r["query_id"]: r["ndcg"]
           for r in ndcg_at_k_df(rdf, qdf, k=k).collect()}
    assert set(got) == set(rels_by_q)
    for q in rels_by_q:
        assert got[q] == pytest.approx(
            ndcg_at_k(ranked_by_q[q], rels_by_q[q], k=k)), q


def test_quality_bench_harness_hash_rm(spark):
    """The full harness (sem_sim_join batch retrieval -> distributed
    nDCG) on the toy corpus: HashRM is lexical, the topics are disjoint,
    so ranking should be near-perfect."""
    from benchmarks.quality_bench import run, toy_tables
    from lotus_spark.models.rm import HashRM

    corpus, queries, qrels = toy_tables(spark)
    rec = run(spark, corpus, queries, qrels, HashRM(dim=256), k=10)
    assert rec["n_queries"] == 3
    assert rec["value"] >= 0.8


def test_quality_bench_real_model_tier(spark):
    """Paper-adjacent baseline with a real embedding model — runs only
    where sentence-transformers is installed (reference asserts
    nDCG@10 > 0.6 on SciFact with live models; the toy corpus is far
    easier, so the bar is higher)."""
    pytest.importorskip("sentence_transformers")
    from benchmarks.quality_bench import run, toy_tables
    from lotus_spark.models.rm import SentenceTransformersRM

    corpus, queries, qrels = toy_tables(spark)
    rec = run(spark, corpus, queries, qrels,
              SentenceTransformersRM(model="all-MiniLM-L6-v2"), k=10)
    assert rec["value"] >= 0.6
