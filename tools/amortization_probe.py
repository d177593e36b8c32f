"""Amortization probe: measure the two write-once/query-many claims.

1. **Bucketed tables**: a repeat equi-join on the bucket key reads
   co-located buckets (zero Exchange) — how much wall does that save
   per query vs the plain-parquet join that re-shuffles both sides,
   and how many repeat joins pay back the bucketed write?
2. **Batched ANN serving**: ``knn_topk_ivfpq_batch`` answers Q queries
   in one union-of-probed-cells pass — wall vs Q sequential
   ``knn_topk_ivfpq`` calls on the same index.

Usage: python tools/amortization_probe.py [sf_dir]  (default sf0.1)
Writes BENCH_amortize.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

REPS = 5
N_QUERIES = 16


def best_of(n, fn):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lotus_spark.functions.ann import (
        ivf_index, knn_topk_ivfpq, knn_topk_ivfpq_batch, pq_index,
    )
    from lotus_spark.session import get_spark
    from lotus_spark.sources.bucketed import (
        drop_bucketed, read_bucketed, write_bucketed,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    out = {}

    # --- bucketed repeat-join amortization -----------------------------
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def plain_join():
        (cu.join(od, cu.c_custkey == od.o_custkey)
         .groupBy("c_mktsegment").agg(F.count("*")).collect())

    plain_join()  # warm
    t_plain = best_of(REPS, plain_join)

    d = tempfile.mkdtemp(prefix="amortize_")
    try:
        t0 = time.time()
        write_bucketed(cu, "am_cust", "c_custkey", 8, sort_cols="c_custkey",
                       path=f"{d}/c")
        write_bucketed(od, "am_ord", "o_custkey", 8, sort_cols="o_custkey",
                       path=f"{d}/o")
        t_write = round(time.time() - t0, 3)

        bc, bo = read_bucketed(spark, "am_cust"), read_bucketed(spark, "am_ord")

        def bucketed_join():
            (bc.join(bo, bc.c_custkey == bo.o_custkey)
             .groupBy("c_mktsegment").agg(F.count("*")).collect())

        bucketed_join()  # warm
        t_bucketed = best_of(REPS, bucketed_join)
        saving = t_plain - t_bucketed
        out["bucketed_join"] = {
            "plain_join_sec": t_plain,
            "bucketed_join_sec": t_bucketed,
            "bucketed_write_sec": t_write,
            "queries_to_amortize_write": (
                round(t_write / saving, 1) if saving > 0 else None),
        }
    finally:
        drop_bucketed(spark, "am_cust")
        drop_bucketed(spark, "am_ord")
        shutil.rmtree(d, ignore_errors=True)

    # --- batched ANN serving amortization ------------------------------
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    indexed, cents = ivf_index(emb, "embedding", n_cells=16, seed=42,
                               method="deterministic", id_col="vec_id")
    encoded, books = pq_index(indexed, "embedding", "vec_id", m=8,
                              nbits=4, seed=101)
    encoded = encoded.localCheckpoint()  # isolate SERVING cost from build
    qvecs = {
        f"q{r['vec_id']}": [float(x) for x in r["embedding"]]
        for r in emb.filter(f"vec_id < {N_QUERIES}").collect()
    }

    def sequential():
        for vec in qvecs.values():
            knn_topk_ivfpq(encoded, cents, books, vec, k=10,
                           n_probe=8, id_col="vec_id").collect()

    def batched():
        knn_topk_ivfpq_batch(encoded, cents, books, qvecs, k=10,
                             n_probe=8, id_col="vec_id").collect()

    sequential(); batched()  # warm
    t_seq = best_of(3, sequential)
    t_batch = best_of(3, batched)
    out["batched_ann_serving"] = {
        "n_queries": N_QUERIES,
        "sequential_sec": t_seq,
        "batched_sec": t_batch,
        "speedup": round(t_seq / t_batch, 2) if t_batch > 0 else None,
    }

    rec = {
        "metric": "amortization_probe",
        "value": out["batched_ann_serving"]["speedup"],
        "unit": "x",
        "sf_dir": sf_dir,
        **out,
        "note": ("write-once/query-many claims measured: bucketed tables "
                 "(repeat-join saving vs plain parquet + write payback "
                 "count) and batched IVF-PQ serving (one probed-cell-union "
                 "pass vs Q sequential queries); headline value = batch "
                 "serving speedup"),
    }
    with open(os.path.join(ROOT, "BENCH_amortize.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
