#!/usr/bin/env python3
"""DuckDB side of the large-sf job-floor bench (VERDICT r4 #1).

Runs the oracle SQL of selected queries against a parquet data dir with the
same protocol as graft.Bench (1 warmup + 3 timed, median), 32 threads.

Usage: python3 scripts/bench_duckdb.py <dataDir> <oracle_sql.json> q01_... q03_...

Tables may be single parquet files (driver layout) or directories of part
files (ScaleGen layout) — both are registered as views.
"""
import sys, os, json, time, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    data_dir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in TABLES:
        p = f"{data_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    out = {}
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            print(f"-- {name}: no oracle sql, skipped", file=sys.stderr)
            continue
        def once():
            t0 = time.time()
            con.sql(sql).fetchall()
            return time.time() - t0
        cold = os.environ.get("BENCH_DUCK_COLD") == "1"
        if not cold:
            once()  # warmup
        times = sorted(once() for _ in range(1 if cold else 3))
        out[name] = round(times[len(times) // 2], 4)
        print(f"-- {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"engine": "duckdb", "sf_dir": data_dir,
        "cold": os.environ.get("BENCH_DUCK_COLD") == "1", "queries": out}))


if __name__ == "__main__":
    main()
