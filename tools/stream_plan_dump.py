"""Dump the EXECUTED streaming plan + state-operator progress metrics
for streaming registry queries to plans/$SPARK_GRAFT_ROUND/ (default
r15).

Usage: python tools/stream_plan_dump.py <suffix> <query> [query...]

Batch ``.explain("formatted")`` cannot show a streaming query's state
machinery, so this intercepts ``DataStreamWriter.start`` while the
registry function runs, then captures each started query's
``explain()`` (the last executed micro-batch's physical plan — the
``StateStoreSave``/``Exchange`` nodes carry the state partition count)
and its ``lastProgress`` JSON (``stateOperators[].numShufflePartitions``
is the committed state-store partition count per operator).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

import __spark_entry__ as entry  # noqa: E402
from lotus_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans",
                           os.environ.get("SPARK_GRAFT_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    from pyspark.sql.streaming import DataStreamWriter

    for name in names:
        started: list = []
        orig = DataStreamWriter.start

        def patched(self, *a, **k):
            q = orig(self, *a, **k)
            started.append(q)
            return q

        DataStreamWriter.start = patched
        try:
            qs[name](spark, sf_dir).count()
        finally:
            DataStreamWriter.start = orig
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            for q in started:
                prog = q.lastProgress or {}
                f.write(f"== streaming query {q.name} ==\n")
                f.write("-- lastProgress.stateOperators --\n")
                f.write(json.dumps(prog.get("stateOperators", []),
                                   indent=1))
                f.write(f"\n-- batchDuration: "
                        f"{prog.get('batchDuration')} ms --\n")
                f.write("-- explain() of the last executed micro-batch "
                        "--\n")
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    q.explain()
                f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
