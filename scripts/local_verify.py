#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/local_verify.py <verify_out_dir> <sf_dir> [q1,q2,...]

The optional third argument restricts the compare to those query names
(for partial Verify dumps, e.g. the sf1 probe-family sweep); unknown
names fail loudly, mirroring Verify's SPARK_GRAFT_ONLY contract.

Expects `graft.Verify` to have been run first (it writes one parquet dir per
query plus oracle_sql.json). For each query: run the oracle SQL in DuckDB
with views over the sf_dir parquet tables, canonicalize both result sets
(sort columns by name, sort rows, round floats), and diff.

This is a harness for the build loop only — the driver runs its own copy of
this logic; matching here is a strong predictor, not a guarantee.
"""
import json
import os
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes exact values; we keep full repr to catch ulp drift
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver-generated tables are single files; Spark-derived dirs
        # (the ScaleProbe sf1 tree) hold part files one level down
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:
        names = [n.strip() for n in sys.argv[3].split(",") if n.strip()]
        if not names:
            # an empty filter would "pass" having compared nothing —
            # the vacuous-gate failure mode Verify's SPARK_GRAFT_ONLY
            # contract exists to prevent
            sys.exit("empty query-name filter (would check nothing)")
        unknown = [n for n in names if n not in oracle]
        if unknown:
            sys.exit(f"unknown query names (no oracle): {unknown}")
        oracle = {n: oracle[n] for n in names}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = spark_rel.columns
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            duck_rel = con.sql(sql)
            duck_cols = duck_rel.columns
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(spark_rows, spark_cols)
        dc, dr = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: row count spark={len(sr)} duck={len(dr)}")
            n_fail += 1
        elif sr != dr:
            bad = next(i for i in range(len(sr)) if sr[i] != dr[i])
            print(f"FAIL {name}: first diff at row {bad}:\n  spark={sr[bad]}\n  duck ={dr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
