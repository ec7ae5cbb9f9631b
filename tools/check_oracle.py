#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(tables = parquet files in sfDir), read the Spark result parquet, sort
columns by name, sort rows, compare row count / schema-ish / values
(floats to 1e-6). Prints PASS/FAIL per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "\x00None"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1
            continue
        orows = sorted(tuple(norm(v) for v in r)
                       for r in odf[ocols].itertuples(index=False))
        srows = sorted(tuple(norm(v) for v in r)
                       for r in sdf[scols].itertuples(index=False))
        if orows != srows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, srows))
                       if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  oracle: {orows[bad]}")
            print(f"  spark : {srows[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(odf)} rows)")
        n_pass += 1
    # rows-only queries: present in outDir but not in oracle json
    import os
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json" or name in oracle:
            continue
        try:
            n = con.execute(
                f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
            ).fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows")
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
