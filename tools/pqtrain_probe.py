"""PQ codebook-training probe: sample-bounded vs full-corpus training.

Round 6 made pq_index/ivf_index train their quantizers on a pinned hash
sample (round-5 verdict item 1: full-corpus training = ~m*iters
full-table aggregate passes, the dominant index-build cost at scale).
This probe MEASURES that claim at a size where the passes dominate the
fixed overhead: a deterministic synthetic embedding table (default 1M
rows x 32 dims), pq_index built twice — ``max_train_rows=None`` (the
old full-corpus behavior) vs the auto sample — same map-only encode
either way. Reports build walls + the ratio, and each tier's ADC
top-20 recall against exact brute-force cosine (quality: the sampled
tier must not trail the full tier; absolute recall is data-dependent —
uniform synthetic vectors have weak neighborhood structure).

Note the measured speedup UNDERSTATES the 100 TB effect: the 8
per-subspace encodes chain lazily into ONE materialization pass, while
full-corpus training forces m*iters eager aggregate jobs over the whole
table — the part that grows with data size — so the training fraction
of the build grows with the corpus while encode stays one scan.

Writes BENCH_pqtrain.json. Usage:
    python tools/pqtrain_probe.py [--rows 1000000] [--dim 32]
        [--sample 50000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--sample", type=int, default=50_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "16g")
        .appName("pqtrain_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from lotus_spark.functions.ann import knn_topk_pq, pq_index

    # deterministic pseudo-embeddings: dim j of row i = a hash-fold of
    # (i, j) scaled into [-1, 1) — no RNG state, executor-computable
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(args.dim - 1)),
        lambda j: (F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(2_000_003))
                   .cast("double") / F.lit(1_000_001.5)) - F.lit(1.0),
    )
    df = (spark.range(args.rows).withColumnRenamed("id", "vec_id")
          .repartition(args.cpus).withColumn("embedding", emb).persist())
    df.count()

    q_row = df.filter("vec_id = 12345").first()
    q = [float(x) for x in q_row["embedding"]]
    from lotus_spark.functions.ann import knn_topk

    exact = {r["vec_id"] for r in
             knn_topk(df, "embedding", q, k=20, id_col="vec_id").collect()}

    def build(max_train_rows):
        t0 = time.monotonic()
        enc, books = pq_index(df, "embedding", "vec_id", m=8, nbits=4,
                              seed=42, max_train_rows=max_train_rows)
        ids = [r["vec_id"] for r in
               knn_topk_pq(enc, books, q, k=20, id_col="vec_id").collect()]
        return round(time.monotonic() - t0, 2), ids

    # warm one tiny build so codegen/UDF priming isn't charged to either
    pq_index(df.limit(2048), "embedding", "vec_id", m=8, nbits=4,
             max_train_rows=None)

    t_sampled, ids_s = build(args.sample)
    t_full, ids_f = build(None)
    out = {
        "metric": "pqtrain_probe",
        "rows": args.rows,
        "dim": args.dim,
        "sample_rows_target": args.sample,
        "cpus": args.cpus,
        "build_full_s": t_full,
        "build_sampled_s": t_sampled,
        "speedup": round(t_full / max(t_sampled, 1e-9), 2),
        "recall20_sampled_vs_exact": len(set(ids_s) & exact) / 20.0,
        "recall20_full_vs_exact": len(set(ids_f) & exact) / 20.0,
        "top20_overlap_sampled_vs_full": len(set(ids_s) & set(ids_f)) / 20.0,
    }
    with open(os.path.join(ROOT, "BENCH_pqtrain.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
