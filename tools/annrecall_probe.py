"""IVF-PQ recall@k probe: states the achieved recall of the DEFAULT
(auto-rerank) `knn_topk_ivfpq` configuration against exact brute force.

Round-6 verdict item 2: `BENCH_pqtrain.json` measured ADC-only recall@20
of 0.25 on uniform synthetic vectors, and nothing stated what a caller
of the default path actually gets. Round 7 made the exact rerank the
default (`rerank_k="auto"` = max(4k, 40), opt-out via None); this probe
MEASURES the resulting recall on the testdata embeddings (the repo's
real embedding table: clustered label structure, not uniform noise) so
the recall contract is an artifact, not a claim. Reference analog: the
paper-results quality gates in
/root/reference/benchmarks/reranking/test_paper_results.py:228-238
(those need live models; this is the deterministic tier).

For every query (a sample of in-corpus vectors), exact top-k by
brute-force cosine is the truth set; recall@k = |approx ∩ exact| / k,
averaged over queries, for: ADC-only (rerank_k=None), the auto default,
2x the auto shortlist, and rerank over everything scanned (the
upper bound given IVF probe loss).

Writes BENCH_annrecall.json. Usage:
    python tools/annrecall_probe.py [--sf-dir /root/testdata/sf0.1]
        [--k 10] [--queries 32] [--n-probe 8] [--cpus 32]
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
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--n-probe", type=int, default=8)
    ap.add_argument("--n-cells", type=int, default=16)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .appName("annrecall_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from lotus_spark.functions.ann import (
        ivf_index, knn_topk, knn_topk_ivfpq, pq_index,
    )
    from lotus_spark.functions.text import MOD

    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n = emb.count()
    k = args.k
    ts = (7, MOD // 2)
    indexed, cents = ivf_index(emb, "embedding", n_cells=args.n_cells,
                               seed=42, method="deterministic",
                               id_col="vec_id", train_sample=ts)
    encoded, books = pq_index(indexed, "embedding", "vec_id", m=8,
                              nbits=4, seed=101, train_sample=ts)
    encoded = encoded.persist()
    encoded.count()

    qrows = emb.orderBy("vec_id").limit(args.queries).collect()
    auto = max(4 * k, 40)
    tiers = {
        "adc_only": None,
        "auto_default": "auto",
        "rerank_2x_auto": 2 * auto,
        "rerank_all_probed": n,
    }
    # sweep BOTH knobs: rerank depth (PQ quantization loss) and n_probe
    # (IVF candidate loss) — at n_probe = n_cells + full rerank the
    # composition is exhaustive, so that cell must read 1.0; the gap
    # between the n_probe rows is pure probe loss, the gap within a row
    # is pure ADC-ordering loss.
    probes = sorted({args.n_probe, args.n_cells})
    recalls = {p: {t: 0.0 for t in tiers} for p in probes}
    t0 = time.time()
    for row in qrows:
        q = [float(x) for x in row["embedding"]]
        exact = {r["vec_id"] for r in
                 knn_topk(emb, "embedding", q, k=k,
                          id_col="vec_id").collect()}
        for p in probes:
            for tier, rk in tiers.items():
                got = {r["vec_id"] for r in
                       knn_topk_ivfpq(encoded, cents, books, q, k=k,
                                      n_probe=p, id_col="vec_id",
                                      rerank_k=rk).collect()}
                recalls[p][tier] += len(got & exact) / k
    for p in probes:
        for tier in tiers:
            recalls[p][tier] = round(recalls[p][tier] / len(qrows), 4)
    wall = round(time.time() - t0, 1)

    out = {
        "metric": "ivfpq_recall_at_k",
        "value": recalls[args.n_probe]["auto_default"],
        "unit": "recall",
        "k": k,
        "n_rows": n,
        "n_queries": len(qrows),
        "n_probe": args.n_probe,
        "n_cells": args.n_cells,
        "auto_rerank_k": auto,
        "recalls_by_n_probe": {str(p): recalls[p] for p in probes},
        "sf_dir": args.sf_dir,
        "wall_sec": wall,
        "note": ("recall of the DEFAULT knn_topk_ivfpq (auto rerank) vs "
                 "exact brute force; adc_only is the explicit opt-out "
                 "tier; rerank_all_probed bounds what rerank can recover "
                 "given IVF probe loss; the n_cells probe row isolates "
                 "ADC loss (full-probe + full-rerank must be 1.0)"),
    }
    path = os.path.join(ROOT, "BENCH_annrecall.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
