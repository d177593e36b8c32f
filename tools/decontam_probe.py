"""Decontamination-probe scaling: the r10 verdict's one missing scale
law. Two axes, measured at a fixed knob set (GPT-3 13-gram rule):

1. EVAL-INDEX growth (the corpus analog): probe wall at a FIXED
   increment as the indexed eval suite grows 10x. The load-bearing
   claim (functions/decontam_index.py): the eval side is small by
   nature and BROADCASTS, so the probe should be ~flat in eval size.
2. INCREMENT growth (the honest linear axis): probe wall at a fixed
   eval index as the increment grows 10x. The increment side is one
   Arrow map pass + a broadcast join — cost is expected LINEAR in
   increment bytes; reported so the law is measured, not assumed.

Also records the one-time index write cost and the in-hand
``contamination_overlap`` recompute (what the persisted index replaces:
it re-hashes the EVAL side per increment and ships eval text around).

Usage: python tools/decontam_probe.py [sf_dir]   (default sf0.1)
Writes BENCH_decontam.json at the repo root.
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
NGRAM_N = 13


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lotus_spark.functions.decontam_index import (
        contamination_against_index, write_ngram_index,
    )
    from lotus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    inc = (docs.orderBy("doc_id").limit(N_INC)
           .withColumn("doc_id", F.col("doc_id") + 10_000_000)
           .localCheckpoint())
    inc_10x = (docs.withColumn("doc_id", F.col("doc_id") + 20_000_000)
               .localCheckpoint())
    n_inc10 = inc_10x.count()

    out = {
        "metric": "decontam_probe_scaling",
        "unit": "x_probe_wall_at_10x_eval",
        "ngram_n": NGRAM_N,
        "n_increment": N_INC,
    }
    d = tempfile.mkdtemp(prefix="ngprobe_")
    try:
        for name, mod in (("eval_1x", 100), ("eval_10x", 10)):
            ev = docs.filter(F.col("doc_id") % mod == 0)
            n_ev = ev.count()
            path = f"{d}/{name}"
            t0 = time.time()
            write_ngram_index(ev, path, "text", "doc_id", ngram_n=NGRAM_N)
            t_write = time.time() - t0
            probes = []
            for _ in range(3):
                t0 = time.time()
                contamination_against_index(
                    spark, path, inc, "text", "doc_id").count()
                probes.append(round(time.time() - t0, 2))
            rec = {
                "eval_rows": n_ev,
                "write_sec": round(t_write, 2),
                "probe_sec_best": min(probes),
                "probe_secs": probes,
            }
            if name == "eval_1x":
                # the honest linear axis: 10x increment, fixed eval
                probes10 = []
                for _ in range(3):
                    t0 = time.time()
                    contamination_against_index(
                        spark, path, inc_10x, "text", "doc_id").count()
                    probes10.append(round(time.time() - t0, 2))
                rec["probe_10x_increment_sec_best"] = min(probes10)
                rec["probe_10x_increment_secs"] = probes10
                rec["n_increment_10x"] = n_inc10
                # what the index replaces: re-hash BOTH sides in hand
                # per increment (contamination_overlap), eval text
                # shipped to the job every day
                from lotus_spark.functions.dedup import (
                    contamination_overlap,
                )

                t0 = time.time()
                contamination_overlap(
                    inc, ev, "text", "doc_id", shingle_n=NGRAM_N,
                ).count()
                rec["inhand_recompute_sec"] = round(time.time() - t0, 2)
            out[name] = rec
        out["value"] = round(
            out["eval_10x"]["probe_sec_best"]
            / max(out["eval_1x"]["probe_sec_best"], 1e-9), 2)
        out["increment_scale_x"] = round(
            out["eval_1x"]["probe_10x_increment_sec_best"]
            / max(out["eval_1x"]["probe_sec_best"], 1e-9), 2)
    finally:
        shutil.rmtree(d, ignore_errors=True)

    dst = os.path.join(ROOT, "BENCH_decontam.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
