#!/usr/bin/env python3
"""Cross-engine THAW check: a real DuckDB instance acts as the external
catalog writer. It loads a graft-lake freeze's ducklake_catalog.sql
(reference-shaped 28-table layout), optionally commits a mutation the way a
foreign engine would (a new snapshot + data-file row), then COPYs every
ducklake_* table to parquet — the materialization graft's
`Lake.importCatalog` (see graft.ThawDemo) consumes.

Usage: python3 scripts/thaw_check.py <frozenDir> <outParquetDir>
"""
import os
import sys
import duckdb

def main():
    frozen, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(open(f"{frozen}/ducklake_catalog.sql").read())
    tables = [r[0] for r in con.sql(
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_name LIKE 'ducklake_%'").fetchall()]
    for t in tables:
        n = con.sql(f"SELECT count(*) FROM {t}").fetchone()[0]
        if n == 0:
            continue  # empty layout tables have no parquet schema to carry
        os.makedirs(f"{out}/{t}.parquet", exist_ok=True)
        con.sql(f"COPY {t} TO '{out}/{t}.parquet/part-0.parquet' (FORMAT parquet)")
        print(f"-- exported {t}: {n} rows")
    print("ok")

if __name__ == "__main__":
    main()
