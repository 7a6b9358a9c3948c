#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the engine's parquet dump, sort columns by
name, and compare row count / schema-ish / values cell-by-cell.
Usage: local_verify.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math, datetime
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append(name); print(f"FAIL {name}: no engine output"); continue
    eng = con.sql(f"SELECT * FROM read_parquet({files!r})")
    ecols = sorted(eng.columns)
    edata = con.sql(f"SELECT {', '.join(ecols)} FROM eng").fetchall()
    try:
        ora = con.sql(oracle[name])
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle error {e}"); continue
    ocols = sorted(ora.columns)
    odata = con.sql(f"SELECT {', '.join(ocols)} FROM ora").fetchall()
    if ecols != ocols:
        fails.append(name); print(f"FAIL {name}: cols {ecols} vs {ocols}"); continue
    if len(edata) != len(odata):
        fails.append(name); print(f"FAIL {name}: rows {len(edata)} vs {len(odata)}"); continue
    bad = None
    for i, (er, orow) in enumerate(zip(edata, odata)):
        en, on = [norm(v) for v in er], [norm(v) for v in orow]
        if en != on:
            bad = (i, en, on); break
    if bad:
        fails.append(name)
        print(f"FAIL {name}: row {bad[0]}\n  engine {bad[1]}\n  oracle {bad[2]}")
    else:
        print(f"ok   {name} ({len(edata)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} green" + (f"; FAILS: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
