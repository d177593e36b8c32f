"""Dump .explain("formatted") output for named queries to plans/<round>/.

Usage: python tools/explain_dump.py <suffix> <query> [query...]
       (suffix = "before" | "after"; sf dir from $SPARK_GRAFT_SF_DIR,
        default sf0.1 — plan shape is data-size independent, but the
        bench runs at sf0.1 so AQE-relevant sizes match that scale)

Writes plans/$SPARK_GRAFT_ROUND/<query>_<suffix>.txt (default r15). Building some queries' frames
executes setup Spark jobs (quantizer training, index writes) — that is
part of the query under test and is fine; only the plan text is kept.
"""

from __future__ import annotations

import contextlib
import io
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
    for name in names:
        spark.sparkContext.setJobDescription(f"explain:{name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
