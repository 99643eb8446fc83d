#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, execute each oracle SQL in DuckDB over views named after the
parquet tables, and compare (columns sorted by name, rows as dumped —
queries are expected to ORDER BY explicitly).

Usage: python3 tools/oracle_check.py [sfDir] [outDir] [--skip-verify]
Dev-only tooling; the library itself has no Python dependency.
"""
import json, os, subprocess, sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1200)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit("verify run failed")

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fail += 1
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if exp.shape != got.shape:
        print(f"FAIL {name}: shape exp={exp.shape} got={got.shape}")
        fail += 1
        continue
    diffs = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        if e.dtype.kind == "f" or g.dtype.kind == "f":
            import numpy as np
            ef, gf = e.astype(float).values, g.astype(float).values
            neq = ~((ef == gf) | (pd.isna(ef) & pd.isna(gf)))
            if neq.any():
                i = int(neq.argmax())
                diffs.append(f"{c}: {int(neq.sum())} diffs, first@{i} exp={ef[i]!r} got={gf[i]!r} maxabs={abs(ef[neq]-gf[neq]).max():.3e}")
        else:
            neq = ~(e.astype(str).values == g.astype(str).values)
            if neq.any():
                i = int(neq.argmax())
                diffs.append(f"{c}: {int(neq.sum())} diffs, first@{i} exp={e.iloc[i]!r} got={g.iloc[i]!r}")
    if diffs:
        print(f"FAIL {name}: " + " | ".join(diffs))
        fail += 1
    else:
        print(f"PASS {name} ({exp.shape[0]} rows, {len(exp.columns)} cols)")

print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
