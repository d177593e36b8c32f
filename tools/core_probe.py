"""Core-elasticity probe: does each operator speed up when cores are added?

The data-scale probe (scale_probe.py) shows cost grows ~linearly in rows;
this probe shows the other axis the 100 TB claim needs: giving the SAME
work more cores must shrink wall-clock, or a hidden serial stage (driver
loop, single-task window, one-partition input) is eating the cluster. We
time the volume-sensitive query subset at local[LO] and local[HI] on the
same sf dir and report t_lo / t_hi per query — elastic plans land well
above 1; ~1 means the query is fixed-overhead-bound at this data size
(fine for sub-second rows) or serial (a problem if its absolute time is
large and grows with data).

Separate Spark sessions per core count (cores are a session-level
property); each query is warmed in-session before timing, best-of-N.

Usage: python tools/core_probe.py [--base /root/testdata/sf0.1]
           [--lo 4] [--hi 32] [--repeats 3]
Writes BENCH_coreprobe.json at the repo root.
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
sys.path.insert(0, HERE)

from scale_probe import probe_fns  # noqa: E402


def run_at(cores: int, base: str, repeats: int, warm_dir: str,
           only=None) -> dict:
    from pyspark.sql import SparkSession

    from lotus_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    fns = probe_fns()
    if only:
        missing = sorted(set(only) - set(fns))
        if missing:
            raise SystemExit(f"unknown probe queries: {missing}")
        fns = {k: fns[k] for k in only}
    out = {}
    for name, fn in fns.items():
        try:
            if os.path.isdir(warm_dir):
                fn(spark, warm_dir).count()
            best, n = float("inf"), -1
            for _ in range(repeats):
                t0 = time.time()
                n = fn(spark, base).count()
                best = min(best, time.time() - t0)
            out[name] = {"sec": round(best, 3), "rows": n}
        except Exception as exc:  # noqa: BLE001
            out[name] = {"sec": None, "rows": None, "error": str(exc)[:200]}
        r = out[name]
        print(f"# local[{cores}] {name}: {r['sec']}s ({r['rows']} rows)",
              file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    warm_dir = "/root/testdata/sf0.001"
    lo = run_at(args.lo, args.base, args.repeats, warm_dir, args.only)
    hi = run_at(args.hi, args.base, args.repeats, warm_dir, args.only)

    queries, inelastic = {}, []
    for name in lo:
        a, b = lo[name], hi.get(name, {})
        speedup = (
            round(a["sec"] / b["sec"], 2)
            if a.get("sec") and b.get("sec") else None
        )
        queries[name] = {
            f"t{args.lo}": a.get("sec"), f"t{args.hi}": b.get("sec"),
            "speedup": speedup, "rows": a.get("rows"),
        }
        # flag only queries that are BOTH slow in absolute terms and not
        # helped by cores — sub-second rows are overhead-bound, not serial
        if speedup is not None and speedup < 1.3 and (a.get("sec") or 0) > 1.5:
            inelastic.append(name)
    rec = {
        "metric": "core_probe",
        "base": args.base,
        "lo": args.lo, "hi": args.hi, "repeats": args.repeats,
        "total_lo": round(sum(v[f"t{args.lo}"] or 0 for v in queries.values()), 3),
        "total_hi": round(sum(v[f"t{args.hi}"] or 0 for v in queries.values()), 3),
        "queries": queries,
        "flagged_inelastic": sorted(inelastic),
    }
    with open(os.path.join(ROOT, "BENCH_coreprobe.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("metric", "total_lo", "total_hi",
                       "flagged_inelastic")}))


if __name__ == "__main__":
    main()
