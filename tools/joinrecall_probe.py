"""K-NN JOIN recall probe: what do the approximate join tiers actually
recover, at which knobs?

``BENCH_annrecall.json`` measures the single-query IVF-PQ path;
this probe measures the JOIN tiers — ``ann_join_ivf`` (cell-partitioned,
neither side broadcasts) across ``n_probe``, ``ann_join_pq``
(broadcast PQ codes + exact rerank) across ``pq_candidates``, and
``ann_join_ivfpq`` (cell join over code payloads + by-id rerank, r9)
across ``n_probe`` at the default auto rerank — against
the exact K-NN join (``sem_sim_join`` broadcast_exact) on the same
left/right split. Recall@K = mean per-left-row overlap of the
approximate neighbor set with the exact one.

Usage: python tools/joinrecall_probe.py [sf_dir] (default sf0.1)
Writes BENCH_joinrecall.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

K = 10
N_LEFT = 200
N_CELLS = 16


def neighbor_sets(rows, qcol, mcol):
    out = {}
    for r in rows:
        out.setdefault(r[qcol], set()).add(r[mcol])
    return out


def recall(approx: dict, exact: dict) -> float:
    vals = [
        len(approx.get(q, set()) & ex) / len(ex)
        for q, ex in exact.items() if ex
    ]
    return round(sum(vals) / len(vals), 3) if vals else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from lotus_spark.functions.ann import ann_join_ivf, pq_index
    from lotus_spark.models.vs import BroadcastPQIndex, ann_join_pq
    from lotus_spark.operators.sem_sim_join import sem_sim_join
    from lotus_spark.session import get_spark

    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    left = (emb.filter(F.col("vec_id") % 10 == 0).limit(N_LEFT)
            .select(F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("lemb"))
            .localCheckpoint())
    right = emb.select(F.col("vec_id").alias("rid"),
                       F.col("embedding").alias("remb"))
    n_right = right.count()

    exact_df = sem_sim_join(
        left, right, "lemb", "remb", K=K, left_emb_col="lemb",
        right_emb_col="remb", tie_break="rid",
        strategy="broadcast_exact")
    exact = neighbor_sets(exact_df.select("qid", "rid").collect(),
                          "qid", "rid")

    out = {"ivf_by_n_probe": {}, "pq_by_candidates": {}}
    for n_probe in (1, 2, 4, 8, N_CELLS):
        t0 = time.time()
        got = ann_join_ivf(left, right, "qid", "lemb", "rid", "remb",
                           K=K, n_cells=N_CELLS, n_probe=n_probe,
                           seed=42)
        sets = neighbor_sets(got.select("qid", "match_id").collect(),
                             "qid", "match_id")
        out["ivf_by_n_probe"][str(n_probe)] = {
            "recall": recall(sets, exact),
            "wall_sec": round(time.time() - t0, 2),
        }
    from lotus_spark.functions.ann import ann_join_ivfpq

    out["ivfpq_by_n_probe"] = {}
    for n_probe in (2, 4, 8, N_CELLS):
        t0 = time.time()
        got = ann_join_ivfpq(left, right, "qid", "lemb", "rid", "remb",
                             K=K, n_cells=N_CELLS, n_probe=n_probe,
                             m=8, nbits=4, seed=42, pq_seed=101)
        sets = neighbor_sets(got.select("qid", "match_id").collect(),
                             "qid", "match_id")
        out["ivfpq_by_n_probe"][str(n_probe)] = {
            "recall": recall(sets, exact),
            "wall_sec": round(time.time() - t0, 2),
        }
    # the r10 budget sweep that set auto_rerank_k(K, join=True): recall
    # vs rerank_k at fixed n_probe=8 (wall should stay ADC-flat)
    out["ivfpq_rerank_sweep"] = {}
    for rk in (80, 160, 320, 640):
        t0 = time.time()
        got = ann_join_ivfpq(left, right, "qid", "lemb", "rid", "remb",
                             K=K, n_cells=N_CELLS, n_probe=8,
                             m=8, nbits=4, seed=42, pq_seed=101,
                             rerank_k=rk)
        sets = neighbor_sets(got.select("qid", "match_id").collect(),
                             "qid", "match_id")
        out["ivfpq_rerank_sweep"][str(rk)] = {
            "recall": recall(sets, exact),
            "wall_sec": round(time.time() - t0, 2),
        }
    # sanity ceiling: full probe + rerank over everything scanned == 1.0
    t0 = time.time()
    got = ann_join_ivfpq(left, right, "qid", "lemb", "rid", "remb",
                         K=K, n_cells=N_CELLS, n_probe=N_CELLS,
                         m=8, nbits=4, seed=42, pq_seed=101,
                         rerank_k=n_right)
    sets = neighbor_sets(got.select("qid", "match_id").collect(),
                         "qid", "match_id")
    out["ivfpq_by_n_probe"]["full_probe_full_rerank"] = {
        "recall": recall(sets, exact),
        "wall_sec": round(time.time() - t0, 2),
    }

    enc, books = pq_index(right, "remb", "rid", m=8, nbits=4, seed=101)
    pq_idx = BroadcastPQIndex.build(enc, "rid", "pq_codes", books)
    for cand in (K, 2 * K, 4 * K, 16 * K, n_right):
        t0 = time.time()
        got = ann_join_pq(left, right, pq_idx, "qid", "lemb", "rid",
                          "remb", K=K, candidates=cand)
        sets = neighbor_sets(got.select("qid", "match_id").collect(),
                             "qid", "match_id")
        out["pq_by_candidates"][str(cand)] = {
            "recall": recall(sets, exact),
            "wall_sec": round(time.time() - t0, 2),
        }

    # r10-verdict item 6: the uniform testdata embeddings are the WORST
    # case for coarse quantization (every cell boundary cuts true
    # neighborhoods); real embedding spaces are clustered. Re-run the
    # join tiers on the seeded mixture-of-Gaussians corpus the
    # single-query probe (tools/annrecall_probe.py) already measures,
    # so the join tiers' default-knob recall is known in the regime
    # production embeddings live in.
    sys.path.insert(0, HERE)
    from annrecall_probe import _clustered_corpus

    cemb = _clustered_corpus(spark, n_rows=2000, dim=64,
                             n_clusters=N_CELLS).localCheckpoint()
    cleft = (cemb.filter(F.col("vec_id") % 10 == 0).limit(N_LEFT)
             .select(F.col("vec_id").alias("qid"),
                     F.col("embedding").alias("lemb"))
             .localCheckpoint())
    cright = cemb.select(F.col("vec_id").alias("rid"),
                         F.col("embedding").alias("remb"))
    cexact_df = sem_sim_join(
        cleft, cright, "lemb", "remb", K=K, left_emb_col="lemb",
        right_emb_col="remb", tie_break="rid",
        strategy="broadcast_exact")
    cexact = neighbor_sets(cexact_df.select("qid", "rid").collect(),
                           "qid", "rid")
    out["clustered"] = {"n_right": 2000, "dim": 64,
                        "n_clusters": N_CELLS,
                        "ivf_by_n_probe": {}, "ivfpq_by_n_probe": {}}
    for n_probe in (1, 2, 4, 8, N_CELLS):
        t0 = time.time()
        got = ann_join_ivf(cleft, cright, "qid", "lemb", "rid", "remb",
                           K=K, n_cells=N_CELLS, n_probe=n_probe,
                           seed=42)
        sets = neighbor_sets(got.select("qid", "match_id").collect(),
                             "qid", "match_id")
        out["clustered"]["ivf_by_n_probe"][str(n_probe)] = {
            "recall": recall(sets, cexact),
            "wall_sec": round(time.time() - t0, 2),
        }
        t0 = time.time()
        got = ann_join_ivfpq(cleft, cright, "qid", "lemb", "rid",
                             "remb", K=K, n_cells=N_CELLS,
                             n_probe=n_probe, m=8, nbits=4, seed=42,
                             pq_seed=101)
        sets = neighbor_sets(got.select("qid", "match_id").collect(),
                             "qid", "match_id")
        out["clustered"]["ivfpq_by_n_probe"][str(n_probe)] = {
            "recall": recall(sets, cexact),
            "wall_sec": round(time.time() - t0, 2),
        }

    headline = out["ivf_by_n_probe"].get("8", {}).get("recall")
    rec = {
        "metric": "knn_join_recall_at_k",
        "value": headline,
        "unit": "recall",
        "k": K,
        "n_left": N_LEFT,
        "n_right": n_right,
        "n_cells": N_CELLS,
        "sf_dir": sf_dir,
        **out,
        "note": ("recall of the approximate K-NN JOIN tiers vs the exact "
                 "broadcast join on the same left sample; headline = "
                 "ann_join_ivf at the oracle row's n_probe=8/n_cells=16 "
                 "knobs; the full-probe / candidates=n / "
                 "full_probe_full_rerank rows are the ==1.0 sanity "
                 "(every tier is exact at its budget ceiling by "
                 "construction); ivfpq_by_n_probe runs ann_join_ivfpq "
                 "at the default auto rerank — auto_rerank_k(K, "
                 "join=True) = max(32K, 320) since r10 (raised from "
                 "max(8K, 80): the r10 sweep measured the join wall "
                 "ADC-dominated and flat in the budget while recall "
                 "climbed 0.574->0.78 at n_probe=8, see "
                 "ivfpq_rerank_sweep); the clustered block (r11) "
                 "re-measures the join tiers on the seeded "
                 "mixture-of-Gaussians corpus — near-uniform testdata "
                 "is coarse quantization's worst case, clustered is "
                 "the regime real embeddings live in"),
    }
    with open(os.path.join(ROOT, "BENCH_joinrecall.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("value", "ivf_by_n_probe", "pq_by_candidates")}))


if __name__ == "__main__":
    main()
