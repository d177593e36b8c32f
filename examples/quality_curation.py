"""Runnable walkthrough: the round-11 quality-curation front half.

The shape a pretraining-corpus refresh actually runs, composed from the
engine's map-only / one-shuffle primitives:

    url_normalize + exact_dedup       drop refetches of the same page
                                      (utm params, fragments, :443, ...)
    train_quality_model (once)        MLlib LR over the engine's own
                                      pure-Column quality signals
    gate_by_quality_model             literal-baked sigmoid — scoring a
                                      100 TB corpus is ONE codegen map
                                      stage, no MLlib on the hot path
    dedup_and_split                   ONE MinHash clustering pass both
                                      elects the keep-best survivor AND
                                      assigns the leakage-safe split
                                      (clusters never straddle train/eval)
    snapshot_diff (next refresh)      only re-process what changed

Runs locally:  python examples/quality_curation.py [sf_dir]

The whole chain minus training is the driver-checked oracle row
`pipeline_quality` (training is CI-checked separately: the literal
expression reproduces MLlib transform probabilities to <1e-9).
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from lotus_spark.functions.dedup import dedup_and_split, exact_dedup
    from lotus_spark.functions.quality_model import (
        gate_by_quality_model,
        train_quality_model,
    )
    from lotus_spark.functions.snapshot import snapshot_diff
    from lotus_spark.functions.urls import url_normalize
    from lotus_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. canonical-URL dedup (synthesized messy URLs for the demo —
    #    production reads them from the crawl record)
    # (doc_id % 400 makes ~20% of the pages refetches of an earlier URL,
    # differing only in tracking params/fragment — the crawl reality)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        (F.col("doc_id") % 400).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed#top"))
        .otherwise(F.lit("")),
    )
    d = docs.withColumn("url_norm", url_normalize(url))
    d = exact_dedup(d, "url_norm", "doc_id")
    n1 = d.count()

    # 2. train the quality model on weak labels (demo: the heuristic
    #    lang-id's confident rows; production: wiki-vs-crawl labels)
    labeled = docs.withColumn(
        "label", (F.col("n_chars") >= 200).cast("int")
    )
    model = train_quality_model(labeled, "text", "label")
    d = gate_by_quality_model(d, "text", model, threshold=0.5)
    n2 = d.count()

    # 3. one clustering pass: keep-best dedup + leakage-safe split
    d = dedup_and_split(
        d, "text", "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
        keep_by="n_chars", shingle_n=2, jaccard_threshold=0.5,
    )
    n3 = d.count()
    by_split = {r["split"]: r["count"]
                for r in d.groupBy("split").count().collect()}
    print(f"{n0} docs -> {n1} unique urls -> {n2} past quality gate "
          f"-> {n3} canonical survivors; splits: {by_split}")

    # 4. next refresh: diff against this snapshot, reprocess only changes
    nxt = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 17 == 0,
               F.concat(F.col("text"), F.lit(" updated"))).otherwise(
            F.col("text")),
    )
    changes = snapshot_diff(docs, nxt, "doc_id", ["text"])
    print(f"next refresh: {changes.count()} changed docs to re-process")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
