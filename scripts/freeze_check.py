#!/usr/bin/env python3
"""Cross-engine freeze check: execute a graft-lake freeze's views.sql and
ducklake_catalog.sql in plain DuckDB and query the frozen tables — the
observable of the reference's freeze.sql regression test (attach + SELECT).

Usage: python3 scripts/freeze_check.py <frozenDir> [<view> <expected_rows>]
                [--sum <view> <col> <expected>]   # value-bearing probe (r16)
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
    args = sys.argv[2:]
    if "--sum" in args:
        i = args.index("--sum")
        v, c, want = args[i + 1], args[i + 2], int(args[i + 3])
        got = con.sql(f'SELECT CAST(SUM("{c}") AS BIGINT) FROM "{v}"').fetchone()[0]
        assert got == want, f"sum({v}.{c}): expected {want}, got {got}"
        print(f"OK sum({v}.{c}) == {want}")
        args = args[:i] + args[i + 4:]
    if len(args) >= 2:
        want = int(args[1])
        got = con.sql(f'SELECT count(*) FROM "{args[0]}"').fetchone()[0]
        assert got == want, f"{args[0]}: expected {want} rows, got {got}"
        print(f"OK {args[0]} == {want}")

if __name__ == "__main__":
    main()
