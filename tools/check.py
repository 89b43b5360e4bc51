#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare row-for-row. Dev tooling only — the engine itself never
depends on this."""
import json, math, subprocess, sys
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
SKIP_RUN = "--no-run" in sys.argv

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if not SKIP_RUN:
    r = subprocess.run(
        ["sbt", f"runMain graft.Verify {SF_DIR} {OUT}"],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if "[error]" in r.stdout:
        print("\n".join(l for l in r.stdout.splitlines() if "error" in l.lower())[:4000])
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = con.sql(
            f"SELECT {', '.join(got_cols)} FROM '{OUT}/{name}/*.parquet' ORDER BY ALL"
        ).fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        n_fail += 1
        continue
    try:
        exp = con.sql(sql)
        exp_cols = sorted(exp.columns)
        exp_rows = con.sql(
            f"SELECT {', '.join(exp_cols)} FROM ({sql}) oracle_q ORDER BY ALL"
        ).fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        n_fail += 1
        continue
    if got_cols != exp_cols:
        print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
        n_fail += 1
        continue
    if len(got_rows) != len(exp_rows):
        print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
        n_fail += 1
        continue
    bad = None
    for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
        for c, (gv, ev) in enumerate(zip(g, e)):
            if isinstance(gv, float) and isinstance(ev, float):
                ok = (gv == ev) or (math.isnan(gv) and math.isnan(ev))
                exact = ok
                if not ok and ev and abs(gv - ev) / max(abs(ev), 1e-300) < 1e-9:
                    ok, exact = True, False  # near miss: warn but don't fail
                    print(f"WARN {name}: row {i} col {got_cols[c]}: {gv!r} ~ {ev!r} (not bit-equal)")
                if not ok:
                    bad = (i, got_cols[c], gv, ev)
                    break
            elif gv != ev:
                bad = (i, got_cols[c], gv, ev)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: got {bad[2]!r} expected {bad[3]!r}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1

# queries without an oracle: rows-only smoke
import os
declared = set(oracle)
for d in sorted(os.listdir(OUT)):
    p = os.path.join(OUT, d)
    if os.path.isdir(p) and d not in declared:
        try:
            n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"{'PASS' if n > 0 else 'WARN'} {d} (no oracle, {n} rows)")
        except Exception as e:
            print(f"FAIL {d} (no oracle): {e}")
            n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
