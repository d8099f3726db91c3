#!/usr/bin/env python3
"""Cross-engine THAW check: a real DuckDB instance acts as the external
catalog writer. It loads a graft-lake freeze's ducklake_catalog.sql
(reference-shaped 28-table layout), optionally commits a mutation the way a
foreign engine would (a new snapshot + data-file row), then COPYs every
ducklake_* table to parquet — the materialization graft's
`Lake.importCatalog` (see graft.ThawDemo) consumes.

With --add-view, DuckDB also records a view row in ducklake_view before
the export — the graft import must PRESERVE it (not execute it) and a
re-freeze must re-emit it (LakeSpec "foreign view/macro rows survive
import → freeze round-trip" covers the Spark side of the loop).

Usage: python3 scripts/thaw_check.py <frozenDir> <outParquetDir> [--add-view]
"""
import os
import sys
import duckdb

def main():
    frozen, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(open(f"{frozen}/ducklake_catalog.sql").read())
    if "--add-view" in sys.argv:
        cur = con.sql("SELECT max(snapshot_id) FROM ducklake_snapshot").fetchone()[0]
        con.sql("CREATE OR REPLACE TABLE ducklake_view ("
                "view_id BIGINT, view_uuid VARCHAR, begin_snapshot BIGINT, "
                "end_snapshot BIGINT, schema_id BIGINT, view_name VARCHAR, "
                "dialect VARCHAR, sql VARCHAR, column_aliases VARCHAR)")
        con.sql(f"INSERT INTO ducklake_view VALUES (1, 'duck-view-1', {cur}, "
                "NULL, 0, 'ext_view', 'duckdb', 'SELECT 42 AS answer', NULL)")
        print("-- external writer recorded view ext_view")
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
