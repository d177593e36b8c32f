"""Isolated per-query A/B timing: one PROCESS per query, so the
measurement carries no long-session JIT/GC state and no contention
from sibling bench queries — the protocol NOTES.md prescribes for
adjudicating driver-flagged regressions before acting on them.

Usage:
    python tools/isolated_ab.py QUERY [QUERY...]          # runs each
    python tools/isolated_ab.py --one QUERY               # child mode

Parent mode spawns `--one` children sequentially and merges their JSON
lines into BENCH_ab_<label>.json (default label: today's round marker
passed via --label). Each child: local[$SPARK_GRAFT_CPUS] session, warm
pass at sf0.001, then 3 repeats at $SPARK_GRAFT_SF_DIR with the median
and min reported. `streaming_doc_stats` maps to bench.bench_streaming
(it is a bench micro-entry, not a registry query).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def run_one(name: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from lotus_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    import bench

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    micro = {
        "streaming_doc_stats": bench.bench_streaming,
        "mhindex_probe": bench.bench_index_probe,
        "decontam_probe": bench.bench_decontam_probe,
        "cluster_assign_probe": bench.bench_cluster_assign,
    }
    if name in micro:
        mfn = micro[name]

        def fn(s, d):
            class _N:
                def count(self_inner):
                    return mfn(s, d)
            return _N()
    else:
        fn = entry.queries()[name]

    fn(spark, warm_dir).count()  # warm: one-time codegen/JIT
    spark.catalog.clearCache()
    xs, rows = [], 0
    for _ in range(3):
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        xs.append(round(time.time() - t0, 3))
    print(json.dumps({"query": name, "rows": rows, "samples": xs,
                      "median": sorted(xs)[1], "min": min(xs)}))


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--one":
        run_one(argv[1])
        return 0
    label = "r12"
    if "--label" in argv:
        i = argv.index("--label")
        label = argv[i + 1]
        del argv[i:i + 2]
    results = {}
    for name in argv:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True, cwd=HERE)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(f"{name}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            results[name] = {"error": out.stderr[-500:]}
            continue
        rec = json.loads(line[-1])
        results[name] = rec
        print(f"{name}: median {rec['median']}s min {rec['min']}s "
              f"samples {rec['samples']} rows {rec['rows']}")
    path = os.path.join(HERE, f"BENCH_ab_{label}.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
