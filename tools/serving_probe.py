"""Hybrid stored-serving latency (functions/serving.py): what does ONE
hybrid query (persisted BM25 + persisted IVF-PQ + RRF) cost at sf0.1,
cold vs warm, against the in-hand plan that re-scans and re-embeds the
corpus per query?

The load-bearing claims this probe records:
- per-query cost of the stored path is bounded by index GEOMETRY
  (|query terms| postings buckets + n_probe cells + sidecar literals),
  so a serving process's steady-state latency is the WARM number — the
  term-bucket cache (functions/bm25_store._term_buckets) absorbs the
  per-new-term mini-job;
- the one-time index build is the only full-data pass; the in-hand
  hybrid (bm25_search corpus scan + knn_topk full-table cosine) pays a
  corpus-shaped cost on EVERY query. Byte separation is recorded in
  BENCH_bm25.json; this probe records the wall separation on the same
  box (lower bound: page cache on 32 idle cores hides most of the
  in-hand scan at sf0.1 — the 100 TB story is the bytes law).

Protocol: build both stores once (wall recorded), one unmeasured warm
query, then 3 interleaved rounds over 6 distinct queries (round 0 runs
with a CLEARED term-bucket cache = cold; rounds 1-2 = warm). The
in-hand contrast runs the same 6 queries, 2 rounds, min per query.

Usage: python tools/serving_probe.py [sf_dir]   (default sf0.1, ~5 min)
Writes BENCH_serving.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

N_QUERIES = 6


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from lotus_spark.functions.ann import (
        ivf_index, knn_topk, pq_index, write_ivfpq_index,
    )
    from lotus_spark.functions.bm25 import bm25_search, rrf_fuse
    from lotus_spark.functions.bm25_store import (
        _BUCKET_CACHE, write_bm25_index,
    )
    from lotus_spark.functions.serving import hybrid_search_index
    from lotus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")

    # 6 deterministic queries drawn from the corpus itself: the first 4
    # whitespace tokens of docs 1..6, paired with vectors 1..6
    qrows = (docs.filter(F.col("doc_id").between(1, N_QUERIES))
             .orderBy("doc_id").collect())
    qtexts = [" ".join(r["text"].split()[:4]) for r in qrows]
    vrows = (emb.filter(F.col("vec_id").between(1, N_QUERIES))
             .orderBy("vec_id").collect())
    qvecs = [[float(x) for x in r["embedding"]] for r in vrows]

    work = tempfile.mkdtemp(prefix="serving_probe_")
    rec: dict = {"metric": "hybrid_serving_probe", "sf_dir": sf_dir,
                 "n_queries": N_QUERIES}
    try:
        bm_path, iv_path = f"{work}/bm", f"{work}/iv"
        t0 = time.time()
        write_bm25_index(docs, bm_path, "text", "doc_id", n_buckets=64)
        indexed, cents = ivf_index(emb, "embedding", n_cells=64, seed=42,
                                   method="deterministic",
                                   id_col="vec_id")
        encoded, books = pq_index(indexed, "embedding", "vec_id",
                                  m=8, nbits=4, seed=101)
        write_ivfpq_index(encoded, iv_path, cents, books)
        rec["build_sec"] = round(time.time() - t0, 2)
        rec["index_bytes"] = _dir_bytes(bm_path) + _dir_bytes(iv_path)
        rec["corpus_bytes"] = (
            _dir_bytes(f"{sf_dir}/documents.parquet")
            + _dir_bytes(f"{sf_dir}/embeddings.parquet"))

        def stored_one(i: int) -> float:
            t = time.time()
            hybrid_search_index(spark, bm_path, iv_path, qtexts[i],
                                qvecs[i], k=10, n_probe=8).collect()
            return time.time() - t

        stored_one(0)  # unmeasured warm: JVM/codegen one-time costs
        _BUCKET_CACHE.clear()
        cold: list[float] = []
        warm: dict[int, list[float]] = {i: [] for i in range(N_QUERIES)}
        for rnd in range(3):
            for i in range(N_QUERIES):
                dt = stored_one(i)
                (cold.append(dt) if rnd == 0 else warm[i].append(dt))

        def inhand_one(i: int) -> float:
            t = time.time()
            lex = bm25_search(docs, "text", "doc_id", qtexts[i], k=10)
            vec = knn_topk(emb, "embedding", qvecs[i], k=10,
                           id_col="vec_id").withColumnRenamed(
                               "vec_id", "doc_id")
            rrf_fuse([lex, vec.select("doc_id", "score")], "doc_id",
                     k=10).collect()
            return time.time() - t

        inhand_one(0)  # unmeasured warm
        inhand: dict[int, list[float]] = {i: [] for i in range(N_QUERIES)}
        for _rnd in range(2):
            for i in range(N_QUERIES):
                inhand[i].append(inhand_one(i))

        warm_mins = sorted(round(min(v), 3) for v in warm.values())
        inhand_mins = sorted(round(min(v), 3) for v in inhand.values())
        rec.update({
            "stored_cold_per_query": sorted(round(x, 3) for x in cold),
            "stored_warm_min_per_query": warm_mins,
            "stored_warm_median": warm_mins[len(warm_mins) // 2],
            "inhand_min_per_query": inhand_mins,
            "inhand_median": inhand_mins[len(inhand_mins) // 2],
            "note": ("warm = term-bucket cache populated (the serving "
                     "steady state); in-hand walls are a LOWER bound on "
                     "the separation — page cache on an idle 32-core box "
                     "hides the corpus scan at sf0.1; the bytes law is "
                     "BENCH_bm25.json"),
        })
    finally:
        shutil.rmtree(work, ignore_errors=True)

    with open(os.path.join(ROOT, "BENCH_serving.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
