#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each <name>.parquet the Verify main wrote, runs the matching SQL from
oracle_sql.json in DuckDB against the sfDir parquet tables, and compares:
row count, column names, and exact values (columns sorted by name, rows
sorted by all columns).
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(rows):
    out = []
    for r in rows:
        out.append(tuple(repr(v) for v in r))
    return sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        got_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{got_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{got_dir}/*.parquet'")
            got_cols = [c.lower() for c in got.columns]
            got_rows = got.fetchall()
            exp = con.sql(sql)
            exp_cols = [c.lower() for c in exp.columns]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # sort columns by name (driver behavior)
        gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1; continue
        g = normalize([[r[i] for i in gidx] for r in got_rows])
        e = normalize([[r[i] for i in eidx] for r in exp_rows])
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        if g != e:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
