#!/usr/bin/env python3
"""Prove the JDBC metadata store's SQL surface on REAL PostgreSQL (VERDICT
r7 #3 — the reference's actual catalog database,
/root/reference/src/pgducklake_metadata_manager.cpp:366-404).

This environment has a PostgreSQL 15 server but no pgjdbc jar (offline
resolver), so the JDBC *transport* is proven on embedded Derby
(JdbcStoreSpec / CrossProcessSpec) while THIS script proves the
PG-specific half: every SQL statement JdbcMetadataStore emits, verbatim,
against a live postgres — the TEXT DDL path, the FETCH FIRST probe, and
the unique-key CAS including a genuinely CONCURRENT claim of one
snapshot slot from two sessions (second writer blocks on the
uncommitted first, then fails with SQLSTATE 23505 — the code
isDuplicate() maps to CommitConflictException, JdbcMetadataStore.scala:69-71,
mirroring the reference's subtransaction conflict→retry,
pgducklake_metadata_manager.cpp:294-364).

Usage: python3 scripts/pg_catalog_check.py [host] [port]
(defaults /tmp/graftpg 54329 — see the setup lines it prints on failure)

Statements mirrored from src/main/scala/graft/lake/JdbcMetadataStore.scala:
  DDL          :60-67  (textType "TEXT" for jdbc:postgresql, :56-59)
  probe        :63,66
  list ids     :76-77
  read by id   :86-87
  CAS insert   :101-103
  delete       :133-135
"""
import subprocess, sys, time

HOST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graftpg"
PORT = sys.argv[2] if len(sys.argv) > 2 else "54329"
DB = ["psql", "-h", HOST, "-p", PORT, "-U", "postgres", "-X", "-q",
      "-v", "ON_ERROR_STOP=0", "-P", "footer=off", "-A", "-t"]

def run(sql, check=True):
    p = subprocess.run(DB + ["-c", sql], capture_output=True, text=True)
    if check and p.returncode != 0:
        raise SystemExit(f"FAIL running {sql!r}:\n{p.stderr}")
    return p

def run_verbose(sql):
    """like run() but with VERBOSITY verbose so errors carry SQLSTATE"""
    p = subprocess.run(DB + ["-c", r"\set VERBOSITY verbose", "-c", sql],
                       capture_output=True, text=True)
    return p

fails = []
def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {name}" + (f" ({detail})" if detail else ""))
    if not ok:
        fails.append(name)

run("DROP TABLE IF EXISTS graft_commit_log"); run("DROP TABLE IF EXISTS graft_checkpoint")

# DDL — verbatim from JdbcMetadataStore with textType=TEXT (the PG branch)
for ddl in [
    "CREATE TABLE graft_commit_log (snapshot_id BIGINT PRIMARY KEY, delta TEXT NOT NULL)",
    "CREATE TABLE graft_checkpoint (snapshot_id BIGINT PRIMARY KEY, state TEXT NOT NULL)"]:
    p = run(ddl)
    check(f"DDL: {ddl.split('(')[0].strip()}", p.returncode == 0)

# existence probe — the FETCH FIRST form must be valid PG
p = run("SELECT snapshot_id FROM graft_commit_log FETCH FIRST 1 ROWS ONLY")
check("probe: FETCH FIRST 1 ROWS ONLY", p.returncode == 0)

# CAS insert, then sequential duplicate → 23505
run("INSERT INTO graft_commit_log (snapshot_id, delta) VALUES (1, '{\"v\":1}')")
p = run_verbose("INSERT INTO graft_commit_log (snapshot_id, delta) VALUES (1, '{}')")
check("CAS duplicate -> SQLSTATE 23505", "23505" in p.stderr, p.stderr.strip().splitlines()[0] if p.stderr else "no error?")

# genuinely concurrent claim: session A holds an uncommitted insert of
# slot 7; session B inserts the same slot, BLOCKS on A's lock, and when A
# commits gets the unique violation — the multi-writer race the
# file-store CAS gate exists to prevent on non-atomic substrates
a = subprocess.Popen(DB, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                     stderr=subprocess.PIPE, text=True)
a.stdin.write("BEGIN;\nINSERT INTO graft_commit_log (snapshot_id, delta) VALUES (7, 'A');\n")
a.stdin.flush()
time.sleep(0.5)
b = subprocess.Popen(DB + ["-c", r"\set VERBOSITY verbose",
                           "-c", "INSERT INTO graft_commit_log (snapshot_id, delta) VALUES (7, 'B')"],
                     stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
time.sleep(0.5)
check("concurrent claim: B blocked while A uncommitted", b.poll() is None,
      "B finished early" if b.poll() is not None else "")
a.stdin.write("COMMIT;\n"); a.stdin.close()
a.wait(timeout=10)
b_out, b_err = b.communicate(timeout=10)
check("concurrent claim: loser gets 23505 after winner commits", "23505" in b_err,
      (b_err.strip().splitlines() or ["no error"])[0])
p = run("SELECT delta FROM graft_commit_log WHERE snapshot_id = 7")
check("concurrent claim: winner's row survives", p.stdout.strip() == "A", p.stdout.strip())

# list ids ordered + read by id + wide TEXT round-trip (>64KB — the
# reason textType is TEXT/LONGTEXT, not a bounded VARCHAR)
wide = "x" * 200000
p = subprocess.run(DB, input=f"INSERT INTO graft_commit_log (snapshot_id, delta) VALUES (2, '{wide}');",
                   capture_output=True, text=True)
if p.returncode != 0:
    raise SystemExit(f"FAIL wide insert:\n{p.stderr}")
p = run("SELECT snapshot_id FROM graft_commit_log ORDER BY snapshot_id")
check("list ids ordered", p.stdout.split() == ["1", "2", "7"], p.stdout.split())
p = run("SELECT length(delta) FROM graft_commit_log WHERE snapshot_id = 2")
check("200KB TEXT delta round-trips", p.stdout.strip() == "200000", p.stdout.strip())

# checkpoint insert + delete
run("INSERT INTO graft_checkpoint (snapshot_id, state) VALUES (2, '{}')")
run("DELETE FROM graft_checkpoint WHERE snapshot_id = 2")
p = run("SELECT count(*) FROM graft_checkpoint")
check("checkpoint insert+delete", p.stdout.strip() == "0", p.stdout.strip())

run("DROP TABLE graft_commit_log"); run("DROP TABLE graft_checkpoint")
print("== ALL PASS ==" if not fails else f"== {len(fails)} FAILURES: {fails} ==")
sys.exit(1 if fails else 0)
