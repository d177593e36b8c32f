"""Retrieval-quality benchmark: nDCG@k for sem_sim_join / sem_search.

The reference's paper-regression suite asserts ranking quality against
live models (SciFact nDCG@10 > 0.6,
``/root/reference/benchmarks/reranking/test_paper_results.py:228-238``).
Those baselines need real embedding models; this script is the harness —
it runs wherever the model tier is installed and auto-degrades to the
deterministic HashRM (lexical feature hashing) for plumbing validation
in hermetic environments.

Usage:
    python benchmarks/quality_bench.py                       # toy corpus, HashRM
    python benchmarks/quality_bench.py --rm st               # sentence-transformers
    python benchmarks/quality_bench.py --rm st --model all-MiniLM-L6-v2 \
        --corpus c.parquet --queries q.parquet --qrels r.parquet

Parquet schemas: corpus(doc_id, text), queries(query_id, text),
qrels(query_id, doc_id, rel). A BEIR dataset exported to parquet drops
straight in.

Prints ONE JSON line: {"metric": "ndcg_at_k", "value": mean_ndcg, ...}.

Scale shape: ALL queries evaluate in one distributed job (sem_sim_join:
queries x corpus top-k, broadcast or crossjoin tier by size) followed by
the bounded-row nDCG join — no per-query driver loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TOPICS = {
    "fruit": ["apple banana orchard harvest ripe fruit juice sweet",
              "banana plantation tropical fruit yellow peel sweet",
              "orchard apples pears fruit trees autumn harvest"],
    "space": ["rocket launch orbit satellite space mission nasa",
              "astronaut spacewalk orbit station space gravity",
              "telescope galaxy stars space observation cosmos"],
    "cooking": ["recipe bake oven flour sugar cooking kitchen",
                "chef saute pan garlic cooking dinner kitchen",
                "soup simmer broth vegetables cooking recipe"],
}


def toy_tables(spark):
    """Tiny topical corpus with unambiguous qrels — enough lexical signal
    that even HashRM (bag-of-words hashing) ranks on-topic docs first, so
    the harness is testable without model weights."""
    docs, qrels, queries = [], [], []
    did = 0
    for qid, (topic, texts) in enumerate(_TOPICS.items()):
        queries.append((qid, f"documents about {topic} {texts[0].split()[0]}"))
        for t in texts:
            docs.append((did, t))
            qrels.append((qid, did, 1))
            did += 1
    corpus = spark.createDataFrame(docs, ["doc_id", "text"])
    queries_df = spark.createDataFrame(queries, ["query_id", "text"])
    qrels_df = spark.createDataFrame(qrels, ["query_id", "doc_id", "rel"])
    return corpus, queries_df, qrels_df


def make_rm(kind: str, model: str, dim: int):
    if kind == "hash":
        from lotus_spark.models.rm import HashRM

        return HashRM(dim=dim)
    if kind == "st":
        try:
            import sentence_transformers  # noqa: F401
        except ImportError:
            print("# sentence-transformers not installed; rerun with "
                  "--rm hash or install the model tier", file=sys.stderr)
            raise SystemExit(2)
        from lotus_spark.models.rm import SentenceTransformersRM

        return SentenceTransformersRM(model=model)
    raise ValueError(f"unknown rm {kind!r}")


def run(spark, corpus, queries, qrels, rm, k: int = 10) -> dict:
    from lotus_spark.functions.evalmetrics import ndcg_at_k_df
    from lotus_spark.operators.sem_sim_join import sem_sim_join

    hits = sem_sim_join(
        queries, corpus, "text", "text", K=k, rm=rm,
        return_scores=True, tie_break="doc_id",
    )
    results = hits.select("query_id", "doc_id", F_score(hits))
    per_q = ndcg_at_k_df(results, qrels, k=k)
    rows = per_q.collect()
    mean = sum(r["ndcg"] for r in rows) / len(rows) if rows else 0.0
    return {
        "metric": f"ndcg_at_{k}",
        "value": round(mean, 4),
        "n_queries": len(rows),
        "per_query": {int(r["query_id"]): round(r["ndcg"], 4) for r in rows},
    }


def F_score(df):
    """The similarity column sem_sim_join appends (``_scores``)."""
    from pyspark.sql import functions as F

    for c in ("_scores", "score"):
        if c in df.columns:
            return F.col(c).alias("score")
    raise RuntimeError(f"no similarity column in {df.columns}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rm", default="hash", choices=["hash", "st"])
    ap.add_argument("--model", default="all-MiniLM-L6-v2")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--corpus")
    ap.add_argument("--queries")
    ap.add_argument("--qrels")
    args = ap.parse_args()

    from lotus_spark.session import get_spark

    spark = get_spark(master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")
    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
        queries = spark.read.parquet(args.queries)
        qrels = spark.read.parquet(args.qrels)
    else:
        corpus, queries, qrels = toy_tables(spark)

    rm = make_rm(args.rm, args.model, args.dim)
    rec = run(spark, corpus, queries, qrels, rm, k=args.k)
    rec["rm"] = args.rm
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
