#!/usr/bin/env python3
"""Guard against non-total ORDER BYs: for each Verify dump, parse the
oracle's FINAL ORDER BY clause and check the sort columns determine the
full row (a tie group with >1 distinct full row means the query's output
order — and therefore the driver's row-order-sensitive hash compare — is
nondeterministic across engines). Found live: q_unpivot and
q_filter_nonempty sorted on (l_orderkey, l_linenumber), which is NOT a key
of the synthetic lineitem (11,785 duplicate pairs at sf0.01); both passed
round 3 on luck.

Usage: python3 tools/audit_orderby.py [verifyOutDir]   (dev-only tooling)
"""
import json, re, sys
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
oracle = json.load(open(f"{OUT}/oracle_sql.json"))
con = duckdb.connect()
bad = []
for name, sql in sorted(oracle.items()):
    flat = sql.replace('\n', ' ')
    idx = flat.upper().rfind('ORDER BY')
    if idx < 0:
        # a 1-row result has no order to be nondeterministic about
        # (single-row aggregates like q_chi_square legitimately skip ORDER BY)
        try:
            n = len(con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df())
        except Exception:
            n = -1
        if n != 1:
            print(f"NO-ORDER-BY {name} ({n} rows)")
            bad.append(name)
        continue
    tail = flat[idx + 8:]
    cols = [re.sub(r'[^A-Za-z0-9_.]', '', c.strip().split()[0]) for c in tail.split(',') if c.strip()]
    cols = [c.split('.')[-1] for c in cols if c]
    try:
        df = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    except Exception:
        continue
    cols = [c for c in cols if c in df.columns]
    if not cols:
        # ORDER BY over an expression the regex can't resolve to an output
        # column — fine for 1-row outputs, otherwise inspect by hand
        if len(df) > 1:
            print(f"UNPARSED {name} ({len(df)} rows): {tail[:70]}")
        continue
    # array-valued columns (e.g. signature / id-list outputs) are unhashable
    # for pandas dedup — stringify object columns; uniqueness is preserved
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(str)
    gg = df.drop_duplicates().groupby(cols, dropna=False).size()
    real = gg[gg > 1]
    if len(real):
        print(f"NOT-TOTAL {name}: sort={cols} tie_groups={len(real)} of {len(df)} rows")
        bad.append(name)
print(f"--- {len(bad)} flagged: {bad}")
sys.exit(1 if bad else 0)
