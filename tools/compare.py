#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify output
parquet, run the oracle SQL in DuckDB over the same sf tables, compare
schema + row values strictly (columns sorted by name, rows compared in
order). Usage: compare.py <sfDir> <outDir>"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    got = pq.read_table(files[0]).to_pandas()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
    if len(got) == 0:
        print(f"WARN {name}: EMPTY result (weak check)"); ok += 1; continue
    bad = None
    for c in got.columns:
        g, e = got[c], exp[c]
        try:
            if str(g.dtype).startswith("datetime") or str(e.dtype).startswith("datetime"):
                g = pd.to_datetime(g).astype("datetime64[us]")
                e = pd.to_datetime(e).astype("datetime64[us]")
            eq = (g.values == e.values) | (g.isna().values & e.isna().values)
            if not eq.all():
                i = (~eq).argmax()
                bad = f"col {c} ({g.dtype} vs {e.dtype}) row {i}: {g.iloc[i]!r} vs {e.iloc[i]!r}"
                break
            if str(g.dtype) != str(e.dtype):
                print(f"  note {name}.{c}: dtype {g.dtype} vs {e.dtype} (values equal)")
        except Exception as ex:
            bad = f"col {c}: compare error {ex}"; break
    if bad:
        print(f"FAIL {name}: {bad}"); fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)"); ok += 1

print(f"\n{ok} ok, {fail} fail, {len(oracle)} total")
sys.exit(1 if fail else 0)
