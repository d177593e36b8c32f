"""Runnable walkthrough: a training-data curation pipeline end to end.

Documents in, training shards out — the 100 TB corpus-preparation shape:
near-dup removal (MinHash-LSH banding, never O(n²)), eval-set
decontamination (persisted n-gram index, the GPT-3 any-collision rule),
quality gating (Gopher heuristics), per-language quality-quantile trim,
deterministic
train/val/test split, and finally a reproducible global shuffle
materialized as one sorted file per shard. Runs locally:

    python examples/curation_pipeline.py [sf_dir]   # default sf0.001

Every stage is a hash-checked oracle query on its own (see
__spark_entry__ / CORRECTNESS artifacts); this file is the user-facing
composition. For the checkpointed LazyFrame variant of a composed
pipeline (resume after a mid-run crash), see
``__spark_entry__.q_pipeline_curate``.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from lotus_spark.functions.decontam_index import (
        decontaminate_against_index, write_ngram_index,
    )
    from lotus_spark.functions.dedup import minhash_lsh_dedup
    from lotus_spark.functions.sampling import hash_split, quantile_filter
    from lotus_spark.functions.sharding import write_shards
    from lotus_spark.functions.text import gopher_keep, token_count
    from lotus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "source", "text"))
    n0 = docs.count()

    # 1. NEAR-DUP removal: MinHash signatures -> LSH band buckets ->
    # connected components; keeps one representative per duplicate
    # cluster. Banded candidate generation — no all-pairs stage.
    deduped = minhash_lsh_dedup(docs, "text", "doc_id",
                                n_hashes=16, bands=4)
    n1 = deduped.count()

    # 2. DECONTAMINATION: the eval suite (stand-in: doc_id < 10) is
    # indexed ONCE as hashed n-gram postings (functions/decontam_index;
    # in production this index persists next to the benchmark suite and
    # every increment probes it), and training docs sharing any 8-gram
    # with it are dropped — the GPT-3 rule.
    import tempfile

    eval_idx = tempfile.mkdtemp(prefix="curation_evalidx_") + "/idx"
    write_ngram_index(docs.filter("doc_id < 10"), eval_idx,
                      "text", "doc_id", ngram_n=8)
    clean = decontaminate_against_index(
        spark, eval_idx, deduped.filter("doc_id >= 10"),
        "text", "doc_id", min_hits=1)
    n1b = clean.count()

    # 3. QUALITY gate: Gopher-style heuristics (length, symbol ratios,
    # stopword presence) as pure Column expressions — codegen, no UDF.
    gated = clean.filter(gopher_keep(F.col("text")))
    n2 = gated.count()

    # 4. QUANTILE trim: keep each language's top 80% by token count
    # (exact per-group percent_rank, one shuffle).
    trimmed = quantile_filter(
        gated.withColumn("n_tokens", token_count(F.col("text"))),
        "n_tokens", keep_frac=0.8, by="lang", tiebreak="doc_id")
    n3 = trimmed.count()

    # 5. SPLIT: deterministic content-hash train/val/test — zero
    # shuffle, stable across reruns and derived tables.
    split = hash_split(trimmed, "doc_id",
                       {"train": 0.9, "val": 0.05, "test": 0.05})

    # 5. SHARD: reproducible global shuffle, one sorted file per shard
    # — the layout a data loader streams directly.
    out_dir = os.path.join(tempfile.mkdtemp(prefix="curated_"), "shards")
    write_shards(split.filter("split = 'train'"), out_dir,
                 "doc_id", n_shards=4)

    shards = sorted(d for d in os.listdir(out_dir)
                    if d.startswith("shard="))
    print(f"docs {n0} -> dedup {n1} -> decontam {n1b} -> quality {n2} -> trim {n3}")
    print(f"train shards at {out_dir}: {shards}")

    # 6. THE NEXT DAY: persist the curated corpus's LSH state once,
    # then dedupe each new batch AGAINST it without re-reading a single
    # corpus document (functions/dedup_index.py) — the incremental
    # lifecycle: probe, filter, append the survivors.
    from lotus_spark.functions.dedup_index import (
        append_minhash_index, dedup_against_index, write_minhash_index,
    )

    idx = os.path.join(tempfile.mkdtemp(prefix="corpus_idx_"), "mh")
    write_minhash_index(trimmed, idx, "text", "doc_id",
                        n_hashes=16, bands=4)
    batch = (docs.limit(50)                      # yesterday's docs...
             .withColumn("doc_id", F.col("doc_id") + 10_000_000))
    novel = dedup_against_index(spark, idx, batch, "text", "doc_id",
                                threshold=0.5)
    n_new = novel.count()
    append_minhash_index(spark, idx, novel, "text", "doc_id")
    print(f"increment: {batch.count()} arriving -> {n_new} novel "
          f"(rest near-duplicate the indexed corpus); survivors appended")


if __name__ == "__main__":
    main()
