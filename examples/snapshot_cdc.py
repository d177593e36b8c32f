"""Runnable walkthrough: re-crawl day — CDC the corpus indexes.

examples/daily_increment_dedup.py covers the append-only day (new docs
arrive, nothing leaves). A RE-crawl day is different: the new snapshot
of a site overlaps yesterday's — pages vanished, pages changed, pages
appeared — and every persisted index must reflect the new state or
probes keep matching ghosts. The reference engine has no answer here
short of rebuilding its FAISS state from scratch; this repo treats
delete/upsert as first-class index maintenance (functions/index_cdc.py).

    diff = snapshot_diff(T0, T1, id)            one narrow full-outer join
    apply_snapshot_to_minhash_index(...)        text near-dup index
    apply_snapshot_to_ivfpq_index(...)          vector ANN index
    apply_snapshot_to_ngram_index(...)          (eval suites revise too)

Each apply = delete(removed ∪ changed) + append(added ∪ changed) with
the index's PINNED quantizers/parameters, so the maintained index is
row-identical to a rebuild of the new snapshot — without the rebuild's
quantizer retraining or full-corpus re-encode. The IVF-PQ delete
rewrites ONLY the cell partitions holding the dead ids (localized
deletions prune to a few cells — BENCH_cdc.json); the narrow-table
deletes double as that day's compaction.

Runs locally:  python examples/snapshot_cdc.py [sf_dir]   # default sf0.001

Driver-checked oracle rows: `ivfpq_cdc`, `neardup_index_cdc`.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from lotus_spark.functions.ann import (
        ivf_index, knn_topk_ivfpq, pq_index, read_ivfpq_index,
        write_ivfpq_index,
    )
    from lotus_spark.functions.dedup_index import (
        neardup_join_index, write_minhash_index,
    )
    from lotus_spark.functions.index_cdc import (
        apply_snapshot_to_ivfpq_index, apply_snapshot_to_minhash_index,
    )
    from lotus_spark.functions.snapshot import snapshot_diff
    from lotus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="snapshot_cdc_")
    try:
        # ---- yesterday: both indexes exist over the T0 snapshot ------
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
            .select("vec_id", "embedding")
        mh_path, vec_path = f"{work}/mh", f"{work}/vec"
        write_minhash_index(docs, mh_path, "text", "doc_id",
                            n_hashes=16, bands=4)
        indexed, cents = ivf_index(emb, "embedding", n_cells=16, seed=42,
                                   method="deterministic", id_col="vec_id")
        encoded, books = pq_index(indexed, "embedding", "vec_id",
                                  m=8, nbits=4, seed=101)
        write_ivfpq_index(encoded, vec_path, cents, books)
        print(f"T0 indexed: {docs.count()} docs, {emb.count()} vectors")

        # ---- today: the re-crawl snapshot ----------------------------
        docs_t1 = docs.filter("doc_id % 11 != 0").withColumn(
            "text",
            F.when(F.col("doc_id") % 13 == 5,
                   F.concat(F.col("text"), F.lit(" (updated)")))
            .otherwise(F.col("text")))
        emb_t1 = emb.filter("vec_id % 11 != 0").withColumn(
            "embedding",
            F.when(F.col("vec_id") % 13 == 5, F.reverse(F.col("embedding")))
            .otherwise(F.col("embedding")))

        d_docs = snapshot_diff(docs, docs_t1, "doc_id")
        d_vecs = snapshot_diff(emb, emb_t1, "vec_id")
        print("doc diff:", {r["change"]: r["count"] for r in
                            d_docs.groupBy("change").count().collect()})

        stats_mh = apply_snapshot_to_minhash_index(
            spark, mh_path, d_docs, docs_t1, "text")
        stats_vec = apply_snapshot_to_ivfpq_index(
            spark, vec_path, d_vecs, emb_t1)
        print(f"minhash index: {stats_mh}; ivfpq index: {stats_vec}")

        # ---- probes see the NEW state, not the ghosts -----------------
        removed = docs.filter("doc_id % 11 = 0").limit(1).collect()[0]
        ghost = spark.createDataFrame(
            [(9_999_999, removed["text"])], ["doc_id", "text"])
        hits = neardup_join_index(spark, mh_path, ghost, "text", "doc_id",
                                  threshold=0.9)
        match_ids = [r["match_id"] for r in hits.collect()]
        # surviving near-dups of the removed page may still match (that
        # is correct — they are real corpus content); the REMOVED id
        # itself must be gone
        assert removed["doc_id"] not in match_ids, match_ids
        print(f"probe with a REMOVED page's text: matches {match_ids} "
              f"(the deleted id {removed['doc_id']} is gone; any "
              "remaining ids are its surviving near-dups)")

        stored, c2, b2, cell_col = read_ivfpq_index(spark, vec_path)
        q = [float(x) for x in
             emb.filter("vec_id % 11 = 0").first()["embedding"]]
        top = knn_topk_ivfpq(stored, c2, b2, q, k=5, n_probe=16,
                             id_col="vec_id", cell_col=cell_col)
        ids = [r["vec_id"] for r in top.collect()]
        assert not any(i % 11 == 0 for i in ids), ids
        print(f"ANN top-5 for a removed vector's query: {ids} "
              "(no deleted ids)")

        # ---- fsck after maintenance (r13) -----------------------------
        # validate_index is the CDC day's last step: a bounded read-only
        # pass that says healthy / mid-recovery / corrupt for each store
        # before the next job trusts it.
        from lotus_spark.functions.index_admin import validate_index

        for p, kind in ((mh_path, "minhash"), (vec_path, "ivfpq")):
            rep = validate_index(spark, p, kind)
            assert rep["ok"], rep["checks"]
        print("validate_index: both maintained indexes fsck clean")

        # planted desync: a signature row deleted behind the module's
        # back leaves sigs/buckets disagreeing on the id set — exactly
        # the state the fsck exists to catch before maintenance runs
        from lotus_spark.functions.index_cdc import _fs

        sigs = spark.read.parquet(f"{mh_path}/sigs")
        victim = sigs.first()["id"]
        broken = sigs.filter(F.col("id") != victim)
        jvm, fs, pth = _fs(spark, mh_path)
        broken.write.parquet(f"{work}/sigs_broken")
        fs.delete(pth(f"{mh_path}/sigs"), True)
        fs.rename(pth(f"{work}/sigs_broken"), pth(f"{mh_path}/sigs"))
        rep = validate_index(spark, mh_path, "minhash")
        bad = [c for c in rep["checks"] if not c["ok"]]
        assert not rep["ok"] and bad, rep
        print("planted sigs/buckets desync caught by fsck:",
              [c["check"] for c in bad])
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
