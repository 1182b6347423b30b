#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name, and compares values exactly.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{spark_dir}/*.parquet"))
        stab = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(spark_dir)
        try:
            dtab = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, dcols = sorted(stab.column_names), sorted(dtab.column_names)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if stab.num_rows != dtab.num_rows:
            print(f"FAIL {name}: rows spark={stab.num_rows} duck={dtab.num_rows}")
            n_fail += 1
            continue
        ok = True
        for c in scols:
            sv = [norm(v) for v in stab.column(c).to_pylist()]
            dv = [norm(v) for v in dtab.column(c).to_pylist()]
            if sv != dv:
                for i, (a, b) in enumerate(zip(sv, dv)):
                    if a != b:
                        print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r} "
                              f"(types {stab.schema.field(c).type} vs {dtab.schema.field(c).type})")
                        break
                ok = False
                break
        if ok:
            print(f"PASS {name} ({stab.num_rows} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
