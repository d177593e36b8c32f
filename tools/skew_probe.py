"""Skew probe: do span_dedup / strip_boilerplate survive a hot key?

Round-5 advice item 5. The span_dedup docstring ARGUES that its
aggregate+join plan (rather than a window min) lets AQE skew-split the
hot-gram partition; this probe MEASURES it. Three distribution-matched
synthetic corpora, same row count and doc length:

- ``uniform``  — every doc's tokens are unique to it (no duplicate
  grams at all): the no-dup baseline cost of the plan.
- ``spread``   — half the docs carry a duplicated phrase, but each
  phrase is shared by exactly TWO docs (many cold duplicate keys):
  duplicate-handling work WITHOUT key skew.
- ``hot``      — half the docs carry the SAME phrase (one gram key owns
  ~n/2 posting rows — the cookie-banner / site-footer shape): the
  skew case the window plan would serialize into one task.

If the aggregate+join design holds, wall(hot) ≈ wall(spread) — same
duplicate volume, skew absorbed by map-side combine + AQE skew-join —
and both stay within a small factor of wall(uniform). A window-based
plan would instead pin wall(hot) to the hot gram's occurrence count.

strip_boilerplate runs on ``uniform`` vs ``hot`` (a 50%-frequency line
in one group): its frequency aggregate collapses the hot key map-side
and broadcasts the tiny boilerplate set, so the ratio should likewise
stay flat.

Measurements are interleaved full sweeps (bench methodology, NOTES.md);
writes BENCH_skewprobe.json at the repo root.

Usage: python tools/skew_probe.py [--docs 60000] [--tokens 60]
       [--repeats 3] [--cpus 32]
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


def build_corpora(spark, n_docs: int, n_tokens: int, k: int):
    """Three corpora as (name, DataFrame(doc_id, grp, text)) with
    identical row counts and token counts, differing only in duplicate
    structure. Token text derives from (doc_id, position) hashes —
    deterministic, no RNG state."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    # unique filler: token t of doc d is "w<d>_<t>"
    filler = F.transform(
        F.sequence(F.lit(0), F.lit(n_tokens - 1)),
        lambda t: F.concat(F.lit("w"), F.col("doc_id"), F.lit("_"), t),
    )
    uniform = base.withColumn("text", F.concat_ws(" ", filler)) \
                  .withColumn("grp", F.pmod(F.col("doc_id"), F.lit(8)))

    # duplicated phrase of k tokens, inserted at the front of odd docs
    def with_phrase(phrase_tokens):
        dup_head = F.concat_ws(" ", F.array(*phrase_tokens))
        tail = F.concat_ws(
            "\n",
            dup_head,
            F.concat_ws(" ", F.slice(filler, k + 1, n_tokens - k)),
        )
        return base.withColumn(
            "text",
            F.when(F.col("doc_id") % 2 == 1, tail)
            .otherwise(F.concat_ws(" ", filler)),
        ).withColumn("grp", F.pmod(F.col("doc_id"), F.lit(8)))

    # spread: phrase is shared by doc pairs (2d+1, 2d+3) → each gram key
    # appears exactly twice; hot: one global phrase in all odd docs
    spread = with_phrase([
        F.concat(F.lit(f"p{j}_"), ((F.col("doc_id") - 1) / 4).cast("long"))
        for j in range(k)
    ])
    hot = with_phrase([F.lit(f"hot{j}") for j in range(k)])
    return [("uniform", uniform), ("spread", spread), ("hot", hot)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60_000)
    ap.add_argument("--tokens", type=int, default=60)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("skew_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from lotus_spark.functions.dedup import span_dedup, strip_boilerplate

    corpora = []
    for name, df in build_corpora(spark, args.docs, args.tokens, args.k):
        df = df.repartition(args.cpus).persist()
        df.count()  # materialize: probe the operator, not the generator
        corpora.append((name, df))

    def run_span(df):
        return span_dedup(df, "text", "doc_id", k=args.k).agg(
            F.sum(F.length("text"))).collect()

    def run_strip(df):
        return strip_boilerplate(
            df, "text", "doc_id", "grp", sep="\n", min_frac=0.4
        ).agg(F.sum(F.length("text"))).collect()

    jobs = [(f"span_dedup:{n}", df, run_span) for n, df in corpora] + [
        (f"strip_boilerplate:{n}", df, run_strip)
        for n, df in corpora if n in ("uniform", "hot")
    ]
    times: dict[str, list[float]] = {name: [] for name, _, _ in jobs}
    for name, df, fn in jobs:          # warm pass: plan/codegen priming
        fn(df)
    for _ in range(args.repeats):      # interleaved sweeps
        for name, df, fn in jobs:
            t0 = time.monotonic()
            fn(df)
            times[name].append(round(time.monotonic() - t0, 3))

    med = {n: sorted(ts)[len(ts) // 2] for n, ts in times.items()}
    out = {
        "metric": "skew_probe",
        "docs": args.docs,
        "tokens_per_doc": args.tokens,
        "hot_gram_docs": args.docs // 2,
        "cpus": args.cpus,
        "repeats": args.repeats,
        "times_s": times,
        "median_s": med,
        "ratios": {
            "span_hot_vs_spread": round(
                med["span_dedup:hot"] / med["span_dedup:spread"], 2),
            "span_hot_vs_uniform": round(
                med["span_dedup:hot"] / med["span_dedup:uniform"], 2),
            "strip_hot_vs_uniform": round(
                med["strip_boilerplate:hot"]
                / med["strip_boilerplate:uniform"], 2),
        },
    }
    with open(os.path.join(ROOT, "BENCH_skewprobe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["ratios"]))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
