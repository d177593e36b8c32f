"""Micro-timing harness for iterating on single bench rows.

Usage: python tools/qtime.py <query> [query...] [--reps N]

For each named registered query (or micro-probe alias mhindex_probe /
decontam_probe / cluster_assign_probe / cdc_apply / streaming_doc_stats
from bench.py), runs build+count `reps` times in one warm session and
prints wall seconds plus the number of Spark jobs each run submitted
(via a job group + statusTracker) — the fixed-overhead currency the
optimization guide's small-data regime is priced in. Same session
config as bench.py. Timing-only; correctness lives in check_oracle.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

import __spark_entry__ as entry  # noqa: E402
import bench  # noqa: E402
from lotus_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    reps = 3
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--reps"):
            if "=" in a:
                reps = int(a.split("=", 1)[1])
            else:
                reps = int(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(1_000_000).repartition(int(cpus)).select(
        F.sum(_warm("id"))).collect()

    qs = entry.queries()
    micro = {
        "mhindex_probe": lambda: bench.bench_index_probe(spark, sf_dir),
        "decontam_probe": lambda: bench.bench_decontam_probe(spark, sf_dir),
        "cluster_assign_probe": lambda: bench.bench_cluster_assign(
            spark, sf_dir),
        "cdc_apply": lambda: bench.bench_cdc_apply(spark, sf_dir),
        "streaming_doc_stats": lambda: bench.bench_streaming(spark, sf_dir),
    }
    st = spark.sparkContext.statusTracker()
    for name in args:
        for rep in range(reps):
            group = f"qtime-{name}-{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            if name in micro:
                out = micro[name]()
                n = out[0] if isinstance(out, tuple) else out
                wall = (out[1] if name == "cdc_apply"
                        else time.time() - t0)
            else:
                n = qs[name](spark, sf_dir).count()
                wall = time.time() - t0
            jobs = len(st.getJobIdsForGroup(group))
            print(f"{name} rep{rep}: {n} rows {wall:.2f}s {jobs} jobs",
                  flush=True)
        spark.sparkContext.setJobGroup(f"qtime-end", "end")


if __name__ == "__main__":
    main()
