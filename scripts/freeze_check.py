#!/usr/bin/env python3
"""Cross-engine freeze check: execute a graft-lake freeze's views.sql and
ducklake_catalog.sql in plain DuckDB and query the frozen tables — the
observable of the reference's freeze.sql regression test (attach + SELECT).

Usage: python3 scripts/freeze_check.py <frozenDir> [<view> <expected_rows>]
"""
import sys
import duckdb

def main():
    frozen = sys.argv[1]
    con = duckdb.connect()
    con.sql(open(f"{frozen}/ducklake_catalog.sql").read())
    con.sql(open(f"{frozen}/views.sql").read())
    tables = [r[0] for r in con.sql(
        "SELECT table_name FROM ducklake_table WHERE end_snapshot IS NULL").fetchall()]
    snaps = con.sql("SELECT count(*) FROM ducklake_snapshot").fetchone()[0]
    print(f"catalog: {len(tables)} live tables {tables}, {snaps} snapshots")
    views = [r[0] for r in con.sql(
        "SELECT view_name FROM duckdb_views() WHERE NOT internal").fetchall()]
    for v in views:
        n = con.sql(f'SELECT count(*) FROM "{v}"').fetchone()[0]
        print(f"view {v}: {n} rows")
    if len(sys.argv) > 3:
        want = int(sys.argv[3])
        got = con.sql(f'SELECT count(*) FROM "{sys.argv[2]}"').fetchone()[0]
        assert got == want, f"{sys.argv[2]}: expected {want} rows, got {got}"
        print(f"OK {sys.argv[2]} == {want}")

if __name__ == "__main__":
    main()
