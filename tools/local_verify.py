#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Deliberately PESSIMISTIC, matching the driver's comparison semantics
(r8 post-mortem: the old version normalized list cells and compared
HUGEINT losslessly, so it passed three queries the driver failed):

  * engine result loads via pandas.read_parquet, oracle via duckdb .df()
    -- so DuckDB HUGEINT/DECIMAL columns coerce exactly the way they do
    in the driver (HUGEINT -> float64), and an int64-vs-float64 column
    pair is a FAIL even when values are numerically equal;
  * rows are ordered with pandas sort_values over all columns -- an
    array-valued cell raises "unhashable type: numpy.ndarray" there,
    which is a FAIL (gate-incompatible output shape), never normalized;
  * cells compare by exact repr after only timestamp tz-stripping and
    bytes-hexing (the two spots where parquet and duckdb physically
    differ for identical logical values).

Usage: local_verify.py <sfDir> <verifyOutDir>
"""
import sys, glob, json, math, datetime
import duckdb
import numpy as np
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)) and math.isnan(v):
        return "NaN"
    if isinstance(v, (bool, np.bool_, int, float, np.integer, np.floating)):
        return str(v)  # the driver hashes str(): int64 0 -> '0', float64 0.0 -> '0.0'
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    if isinstance(v, (datetime.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        # parquet DATE loads as object(datetime.date); duckdb gives
        # datetime64 midnight — same logical value, normalize to midnight
        return datetime.datetime.combine(v, datetime.time()).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return repr(v)

def incompatible_shape(df):
    """Array/list-valued object cells break the driver's sort_values."""
    for c in df.columns:
        if df[c].dtype == object:
            for v in df[c].head(50):
                if isinstance(v, (np.ndarray, list, dict)):
                    return c
    return None

fails = []
for name in sorted(oracle):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        fails.append(name); print(f"FAIL {name}: no engine output"); continue
    edf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle error {e}"); continue

    ecols, ocols = sorted(edf.columns), sorted(odf.columns)
    if ecols != ocols:
        fails.append(name); print(f"FAIL {name}: cols {ecols} vs {ocols}"); continue
    edf, odf = edf[ecols], odf[ocols]

    bad_col = incompatible_shape(edf) or incompatible_shape(odf)
    if bad_col is not None:
        fails.append(name)
        print(f"FAIL {name}: gate-incompatible type — array-valued column "
              f"'{bad_col}' (driver pandas sort_values would raise "
              f"'unhashable type: numpy.ndarray'; serialize to JSON text)")
        continue

    # dtype-kind parity: DuckDB HUGEINT/DECIMAL oracle columns coerce to
    # float64/object in pandas while the engine side stays int64/float64;
    # the driver hashes the coerced repr ('0.0' vs '0') and fails.
    def kindclass(s):
        k = {"i": "int", "u": "int", "f": "float", "b": "bool",
             "M": "ts"}.get(s.dtype.kind, "obj")
        if k == "obj":
            vals = s.dropna().head(20)
            if len(vals) and all(isinstance(v, datetime.date) and
                                 not isinstance(v, datetime.datetime) for v in vals):
                return "ts"  # parquet DATE column (object of datetime.date)
        return k
    kind_bad = None
    for c in ecols:
        ek, ok = kindclass(edf[c]), kindclass(odf[c])
        if ek != ok:
            kind_bad = (c, edf[c].dtype, odf[c].dtype); break
    if kind_bad:
        fails.append(name)
        print(f"FAIL {name}: gate-incompatible dtype — column '{kind_bad[0]}' "
              f"engine {kind_bad[1]} vs oracle {kind_bad[2]} "
              f"(HUGEINT/DECIMAL oracle column? cast to ::BIGINT/::DOUBLE)")
        continue

    try:
        edf = edf.sort_values(by=ecols, kind="mergesort").reset_index(drop=True)
        odf = odf.sort_values(by=ocols, kind="mergesort").reset_index(drop=True)
    except TypeError as e:
        fails.append(name)
        print(f"FAIL {name}: gate-incompatible type — driver sort_values raises: {e}")
        continue

    if len(edf) != len(odf):
        fails.append(name); print(f"FAIL {name}: rows {len(edf)} vs {len(odf)}"); continue

    bad = None
    for i in range(len(edf)):
        er = [cell(v) for v in edf.iloc[i]]
        orow = [cell(v) for v in odf.iloc[i]]
        if er != orow:
            bad = (i, er, orow); break
    if bad:
        fails.append(name)
        print(f"FAIL {name}: row {bad[0]}\n  engine {bad[1]}\n  oracle {bad[2]}")
    else:
        print(f"ok   {name} ({len(edf)} rows)")

import os
errs_path = f"{out}/verify_errors.json"
verify_errors = json.load(open(errs_path)) if os.path.exists(errs_path) else {}
for n, msg in sorted(verify_errors.items()):
    print(f"ERRORED {n}: {msg[:200]}")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} green"
      + (f"; FAILS: {fails}" if fails else "")
      + (f"; {len(verify_errors)} ERRORED at engine run time" if verify_errors else ""))
sys.exit(1 if fails or verify_errors else 0)
