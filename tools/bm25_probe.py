"""BM25 serving-cost scaling (functions/bm25_store.py): what does one
query cost against the persisted index as the corpus grows, vs the
one-shot in-hand plan that must scan the corpus text every time?

The load-bearing claims:
- the stored query reads ONLY its terms' bucket partitions of the
  narrow postings table (bytes ∝ matched postings, not corpus text);
- the in-hand plan re-scans and re-tokenizes all text per query — fine
  once, wrong as a serving path.

Measured two ways, because one is hardware-honest and one is
design-honest:
- WALL: both paths on a DISK-backed corpus (the repeat-query shape).
  Caveat recorded in the artifact: a 32-idle-core box with page cache
  hides most of the scan term, so walls here are a lower bound on the
  separation, not the 100 TB story.
- BYTES: what each path must read from storage per query — the pruned
  query-bucket directories for the stored path vs the corpus parquet
  for the in-hand plan. This is the quantity that survives the 1000x
  scale-up (scan cost on an object store is billed in bytes).

Corpus: deterministic synthetic docs over a 2000-token vocabulary at
~230 tokens/doc (web-page scale), 100k docs at 1x / 1M at 10x.
Adjacent per-scale measurement, best-of-2 interleaved.

Usage: python tools/bm25_probe.py     (~6-10 min, local[32])
Writes BENCH_bm25.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

N1 = 100_000
VOCAB = 2_000
QUERY = "tok3 tok77 tok501 tok1337"


def _docs(spark, n):
    """~300 tokens/doc without a 300-expression projection: 10 hashed
    base tokens per doc, the row repeated via one explode+concat (the
    text bytes are what matters to the in-hand scan)."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(F.col("id").alias("doc_id"))
    parts = [
        F.concat(F.lit("tok"),
                 F.pmod(F.xxhash64(F.col("doc_id"), F.lit(j)),
                        F.lit(VOCAB)).cast("string"))
        for j in range(10)
    ]
    chunk = F.concat_ws(" ", *parts)
    reps = [F.concat(F.lit("tok"),
                     F.pmod(F.xxhash64(F.col("doc_id"), F.lit(100 + r)),
                            F.lit(VOCAB)).cast("string"))
            for r in range(20)]
    body = F.concat_ws(" ", chunk, *[
        F.concat_ws(" ", chunk, rep) for rep in reps
    ])
    return df.select("doc_id", body.alias("text"))


def main() -> None:
    import shutil
    import tempfile

    from lotus_spark.functions.bm25 import bm25_search
    from lotus_spark.functions.bm25_store import (
        bm25_search_index, write_bm25_index,
    )
    from lotus_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    out = {"metric": "bm25_probe", "unit": "sec", "scales": {}}
    work = tempfile.mkdtemp(prefix="bm25_probe_")
    try:
        from lotus_spark.functions.bm25_store import (
            _term_buckets, read_bm25_meta,
        )

        def _du(path_str: str) -> int:
            total = 0
            for root, _dirs, files in os.walk(path_str):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                    if not f.startswith(("_", ".")))
            return total

        for scale in (1, 10):
            n = N1 * scale
            corpus = f"{work}/corpus_{scale}"
            _docs(spark, n).write.parquet(corpus)
            docs = spark.read.parquet(corpus)  # DISK-backed, like a user
            path = f"{work}/bm_{scale}"
            t0 = time.time()
            write_bm25_index(docs, path, "text", "doc_id", n_buckets=64)
            build = round(time.time() - t0, 3)

            from lotus_spark.functions import bm25_store as _bs

            best_idx = best_hand = best_warm = float("inf")
            got = want = None
            for _ in range(2):  # interleaved sweeps
                _bs._BUCKET_CACHE.clear()  # cold: pays the bucket job
                t0 = time.time()
                got = bm25_search_index(spark, path, QUERY, k=10).collect()
                best_idx = min(best_idx, time.time() - t0)
                # warm repeat (r12): the term->bucket cache holds the
                # vocabulary, so the serving path skips the mini-job
                t0 = time.time()
                bm25_search_index(spark, path, QUERY, k=10).collect()
                best_warm = min(best_warm, time.time() - t0)
                t0 = time.time()
                want = bm25_search(docs, "text", "doc_id", QUERY,
                                   k=10).collect()
                best_hand = min(best_hand, time.time() - t0)
            assert [(r["doc_id"], r["score"]) for r in got] == \
                [(r["doc_id"], r["score"]) for r in want], "parity!"

            meta = read_bm25_meta(spark, path)
            terms = sorted(set(QUERY.split()))
            buckets = _term_buckets(spark, terms, meta["n_buckets"])
            pruned_bytes = sum(
                _du(f"{path}/postings/bucket={b}") for b in buckets)
            out["scales"][str(scale)] = {
                "build": build,
                "stored_query": round(best_idx, 3),
                "stored_query_warm": round(best_warm, 3),
                "inhand_query": round(best_hand, 3),
                "stored_read_mb": round(pruned_bytes / 1e6, 2),
                "inhand_read_mb": round(_du(corpus) / 1e6, 2),
                "postings_total_mb": round(_du(f"{path}/postings") / 1e6,
                                           2),
            }
            print(f"# scale {scale}: {out['scales'][str(scale)]}",
                  file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    s1, s10 = out["scales"]["1"], out["scales"]["10"]
    out["ratios_10x"] = {k: round(s10[k] / s1[k], 2) for k in s1
                         if s1[k] > 0}
    out["stored_vs_inhand_at_10x"] = round(
        s10["inhand_query"] / s10["stored_query"], 2)
    out["bytes_saved_at_10x"] = round(
        s10["inhand_read_mb"] / max(s10["stored_read_mb"], 0.01), 1)
    out["caveat"] = (
        "walls on an idle 32-core box with page cache understate the "
        "scan term; the bytes columns are the scale-honest comparison")
    out["value"] = s10["stored_query"]
    with open(os.path.join(ROOT, "BENCH_bm25.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
