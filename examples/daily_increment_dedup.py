"""Runnable walkthrough: the daily-increment corpus dedup lifecycle.

The 100 TB shape: the corpus is already deduplicated and INDEXED once
(narrow MinHash-LSH state — band buckets + one signature per doc,
~0.1% of the text bytes); each day's crawl is answered against that
index without recomputing or even reading a single corpus document.

    day 0   write_minhash_index(corpus)          one map-only corpus pass
    day N   minhash_lsh_dedup(increment)         self-dedup the new batch
            dedup_against_index(survivors)       drop what the corpus has
            append_minhash_index(survivors)      grow the index (pinned params)

Runs locally:  python examples/daily_increment_dedup.py [sf_dir]

Verification tiers (pick per run, not per index):
- verify="estimate" (default): signature agreement — the corpus text is
  NEVER read; precision 1.0 / recall 0.949 at the tau=0.9 knife-edge at
  n_hashes=16 (BENCH_mhindex.json).
- verify="exact": true shingle Jaccard against corpus text joined BY
  MATCHED ID only — candidate-bounded, closes the estimator's tau=0.9
  miss when you hold the corpus table anyway.

The whole composition is a driver-checked oracle row
(`neardup_index_lifecycle`); the streaming twin (probe a LIVE feed
against the same index) is `neardup_matches_stream` /
`neardup_index_stream`. The embedding-modality twin with the same
write/append/probe lifecycle is `embedding_neardup_index` over a
persisted IVF-PQ index (see examples/index_serving.py).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from lotus_spark.functions.dedup import minhash_lsh_dedup
    from lotus_spark.functions.dedup_index import (
        append_minhash_index,
        dedup_against_index,
        neardup_join_index,
        write_minhash_index,
    )
    from lotus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    workdir = tempfile.mkdtemp(prefix="daily_dedup_")
    path = f"{workdir}/corpus_index"

    # ---- day 0: index the existing (already-deduped) corpus ----------
    corpus0 = docs.filter("doc_id % 4 = 0")
    write_minhash_index(corpus0, path, "text", "doc_id",
                        n_hashes=16, bands=4, shingle_n=3)
    print(f"day 0: indexed {corpus0.count()} corpus docs -> {path}")

    # ---- day 1: a new crawl arrives ----------------------------------
    inc1 = docs.filter("doc_id % 4 = 1")
    # 1. self-dedup the increment (exact-verify + connected components)
    self1 = minhash_lsh_dedup(inc1, "text", "doc_id", n_hashes=16,
                              bands=4, shingle_n=3,
                              jaccard_threshold=0.5)
    # 2. drop rows the corpus already has (estimator verify: one band
    #    equi-join over the narrow buckets table, never the corpus text)
    surv1 = dedup_against_index(spark, path, self1, "text", "doc_id",
                                threshold=0.5)
    # 3. grow the index with the survivors (sidecar-pinned parameters)
    append_minhash_index(spark, path, surv1, "text", "doc_id")
    print(f"day 1: {inc1.count()} crawled -> {self1.count()} after "
          f"self-dedup -> {surv1.count()} novel, appended")

    # ---- day 2: the next crawl probes the GROWN index ----------------
    inc2 = docs.filter("doc_id % 4 = 2")
    matches = neardup_join_index(spark, path, inc2, "text", "doc_id",
                                 threshold=0.5)
    print(f"day 2: {matches.count()} (doc, corpus-match) pairs at "
          "tau=0.5 (estimator verify)")
    matches.orderBy("doc_id", "match_id").show(5)

    # exact tier: same candidates, true Jaccard — needs the corpus table
    grown_corpus = corpus0.unionByName(surv1)
    exact = neardup_join_index(spark, path, inc2, "text", "doc_id",
                               threshold=0.5, verify="exact",
                               corpus_df=grown_corpus,
                               score_col="jaccard")
    print(f"day 2 (exact verify): {exact.count()} pairs")

    kept2 = dedup_against_index(spark, path, inc2, "text", "doc_id",
                                threshold=0.5)
    print(f"day 2: {kept2.count()} / {inc2.count()} novel docs would "
          "be appended next")
    print(f"done — index persists at {path}")


if __name__ == "__main__":
    main()
