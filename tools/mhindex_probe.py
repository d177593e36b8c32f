"""MinHash-index probe scaling: probe wall at a FIXED increment as the
indexed corpus grows 10x, plus the one-time write cost and the
re-dedup-from-scratch comparison the index exists to beat.

The load-bearing claim (functions/dedup_index.py): a daily increment's
dedup cost rides the NARROW index tables, not the corpus text — so the
probe should grow far slower than the corpus (and re-running
minhash_lsh_dedup over corpus+increment grows with the corpus outright).

Usage: python tools/mhindex_probe.py [sf_dir]   (default sf0.1)
Writes BENCH_mhindex.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

N_INC = 500


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lotus_spark.functions.dedup import minhash_lsh_dedup
    from lotus_spark.functions.dedup_index import (
        neardup_join_index, write_minhash_index,
    )
    from lotus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    n_all = docs.count()
    inc = (docs.orderBy("doc_id").limit(N_INC)
           .withColumn("doc_id", F.col("doc_id") + 10_000_000)
           .localCheckpoint())

    out = {}
    d = tempfile.mkdtemp(prefix="mhprobe_")
    try:
        for frac_name, frac in (("corpus_1x", 0.1), ("corpus_10x", 1.0)):
            corpus = docs.filter(
                (F.col("doc_id") % 10) < int(frac * 10))
            n_c = corpus.count()
            path = f"{d}/{frac_name}"
            t0 = time.time()
            write_minhash_index(corpus, path, "text", "doc_id",
                                n_hashes=16, bands=4)
            t_write = time.time() - t0
            # warm + best-of-3 probe (fixed increment)
            probes = []
            for _ in range(3):
                t0 = time.time()
                neardup_join_index(spark, path, inc, "text", "doc_id",
                                   threshold=0.5).count()
                probes.append(time.time() - t0)
            # r10 exact-verify tier: same candidates, true shingle
            # Jaccard against corpus text joined by matched id — the
            # estimator/exact wall trade, measured
            probes_exact = []
            for _ in range(3):
                t0 = time.time()
                neardup_join_index(spark, path, inc, "text", "doc_id",
                                   threshold=0.5, verify="exact",
                                   corpus_df=corpus).count()
                probes_exact.append(time.time() - t0)
            # the alternative the index replaces: self-dedup of
            # corpus + increment from scratch (once; it's the slow arm)
            t0 = time.time()
            minhash_lsh_dedup(corpus.unionByName(inc), "text", "doc_id",
                              n_hashes=16, bands=4).count()
            t_rededup = time.time() - t0
            out[frac_name] = {
                "corpus_rows": n_c,
                "write_sec": round(t_write, 2),
                "probe_sec_best": round(min(probes), 2),
                "probe_secs": [round(p, 2) for p in probes],
                "probe_exact_sec_best": round(min(probes_exact), 2),
                "probe_exact_secs": [round(p, 2) for p in probes_exact],
                "rededup_from_scratch_sec": round(t_rededup, 2),
            }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    r1, r10 = out["corpus_1x"], out["corpus_10x"]
    rec = {
        "metric": "mhindex_probe_scaling",
        "value": round(r10["probe_sec_best"] / r1["probe_sec_best"], 2),
        "unit": "x_probe_wall_at_10x_corpus",
        "n_increment": N_INC,
        **out,
        "note": ("fixed 500-doc increment probed against a 1x and a 10x "
                 "corpus index: the probe rides the narrow buckets/sigs "
                 "tables so its wall should grow far slower than 10x, "
                 "while re-running the self-dedup over corpus+increment "
                 "(the shape the index replaces) pays the corpus every "
                 "day; write_sec is the one-time index cost; "
                 "probe_exact_* is the r10 verify='exact' tier (true "
                 "shingle Jaccard, corpus text joined by matched id) — "
                 "the estimator/exact wall trade at both corpus sizes"),
    }
    # keep the estimator-quality addendum in the artifact (it was merged
    # in manually in r9; recompute so a re-run never silently drops it)
    rec["estimator_vs_exact"] = estimator_vs_exact(sf_dir)
    with open(os.path.join(ROOT, "BENCH_mhindex.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


def estimator_vs_exact(sf_dir: str = "/root/testdata/sf0.1") -> dict:
    """How good is the signature-agreement verify RELATIVE to the exact
    shingle-Jaccard verify it replaces, on the same candidate set?
    (Banding recall is a separate, analytically-known curve; this
    isolates the estimator.) Precision/recall of est>=tau against
    exact>=tau over the band candidates of an even/odd documents split."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lotus_spark.functions.dedup import word_shingles
    from lotus_spark.functions.dedup_index import (
        neardup_join_index, write_minhash_index,
    )
    from lotus_spark.session import get_spark

    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    corpus = docs.filter("doc_id % 2 = 0")
    inc = docs.filter("doc_id % 2 = 1")
    d = tempfile.mkdtemp(prefix="mhest_")
    try:
        path = f"{d}/idx"
        write_minhash_index(corpus, path, "text", "doc_id",
                            n_hashes=16, bands=4)
        cand = neardup_join_index(spark, path, inc, "text", "doc_id",
                                  threshold=0.0)
        sh = docs.select("doc_id",
                         word_shingles(F.col("text"), 3).alias("sh"))
        exact = (
            cand
            .join(sh.withColumnRenamed("doc_id", "q")
                    .withColumnRenamed("sh", "sq"),
                  F.col("doc_id") == F.col("q"))
            .join(sh.withColumnRenamed("doc_id", "m")
                    .withColumnRenamed("sh", "sm"),
                  F.col("match_id") == F.col("m"))
            .withColumn(
                "exact_j",
                F.size(F.array_intersect("sq", "sm")).cast("double")
                / F.size(F.array_union("sq", "sm")).cast("double"))
            .select("doc_id", "match_id", "est_jaccard", "exact_j")
        )
        rows = exact.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    out = {"n_candidates": len(rows), "by_tau": {}}
    for tau in (0.5, 0.7, 0.9):
        tp = sum(1 for r in rows
                 if r["est_jaccard"] >= tau and r["exact_j"] >= tau)
        fp = sum(1 for r in rows
                 if r["est_jaccard"] >= tau and r["exact_j"] < tau)
        fn = sum(1 for r in rows
                 if r["est_jaccard"] < tau and r["exact_j"] >= tau)
        out["by_tau"][str(tau)] = {
            "precision": round(tp / (tp + fp), 3) if tp + fp else None,
            "recall": round(tp / (tp + fn), 3) if tp + fn else None,
            "tp": tp, "fp": fp, "fn": fn,
        }
    return out


if __name__ == "__main__":
    main()
