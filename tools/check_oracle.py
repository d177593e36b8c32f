"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at a given
sf dir, compares row count, schema (column names), and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified with
float rounding). Usage:  python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == "float64" or pdf[c].dtype == "float32":
            pdf[c] = pdf[c].astype(float).round(6)
        pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import os

    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir

    from lotus_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            status = "ROWS-ONLY" if len(sdf) >= 0 else "EMPTY"
            print(f"{status:5s} {name}: rows={len(sdf)} ({dt:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: cols spark={list(a.columns)} oracle={list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(a)} oracle={len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            failures.append(name)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            i = neq.idxmax()
            print("  spark :", a.loc[i].to_dict())
            print("  oracle:", b.loc[i].to_dict())
            continue
        print(f"OK    {name}: rows={len(a)} ({dt:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
