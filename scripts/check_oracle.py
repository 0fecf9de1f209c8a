#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Loads oracle_sql.json, runs each SQL in DuckDB over the sfDir tables,
reads the Spark parquet dump, and diffs values exactly (string repr).
"""
import duckdb, json, sys

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.execute(f"create view {t} as select * from '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
# key-count + sorted-key-manifest hash: three long-green keys silently
# vanished from the driver's r13 correctness artifact (no err rows, just
# absent) — this line makes a shrunken key set detectable in one diff
# against Verify's identical line.
import hashlib
ksha = hashlib.sha256('\n'.join(sorted(oracle)).encode()).hexdigest()[:12]
print(f'keys={len(oracle)} sha={ksha}')
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f'FAIL {name}: ORACLE ERROR: {e}'); fails += 1; continue
    try:
        got = con.execute(f"select * from '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f'FAIL {name}: SPARK OUTPUT UNREADABLE: {e}'); fails += 1; continue
    exp = exp[sorted(exp.columns)]
    got_cols = sorted(got.columns)
    if sorted(exp.columns) != got_cols:
        print(f'FAIL {name}: COLS exp={sorted(exp.columns)} got={got_cols}'); fails += 1; continue
    got = got[sorted(got.columns)]
    if len(exp) != len(got):
        print(f'FAIL {name}: ROWS exp={len(exp)} got={len(got)}'); fails += 1; continue
    dt = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
          if str(exp[c].dtype) != str(got[c].dtype)]
    if dt:
        print(f'FAIL {name}: DTYPES {dt}'); fails += 1; continue
    bad = []
    for c in exp.columns:
        a = exp[c].astype(str).values
        b = got[c].astype(str).values
        neq = a != b
        if neq.any():
            i = int(neq.argmax())
            bad.append((c, i, a[i], b[i], int(neq.sum())))
    if bad:
        print(f'FAIL {name}: VALUE DIFF {bad[:3]}'); fails += 1
    else:
        print(f'OK   {name} ({len(exp)} rows)')
print(f'== {len(oracle)-fails}/{len(oracle)} pass ==')
sys.exit(1 if fails else 0)
