#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify output
parquet per query, run the dumped oracle SQL in DuckDB over the same
testdata parquets, compare (columns sorted by name, rows sorted, values
compared with exact-after-round semantics)."""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails, passes = [], []
for q, sql in sorted(oracle.items()):
    try:
        got_files = glob.glob(f"{outdir}/{q}/*.parquet")
        if not got_files:
            fails.append((q, "no spark output")); continue
        got = canon(pd.concat([pd.read_parquet(f) for f in got_files]))
        want = canon(con.sql(sql).df())
        if list(got.columns) != list(want.columns):
            fails.append((q, f"cols {list(got.columns)} vs {list(want.columns)}")); continue
        if len(got) != len(want):
            fails.append((q, f"rows {len(got)} vs {len(want)}")); continue
        ok = True
        for c in got.columns:
            g, w = got[c], want[c]
            # the driver's hash is TYPE-sensitive: a DuckDB HUGEINT
            # (object/float dtype here) vs Spark BIGINT mismatches even
            # when values are integer-identical — flag dtype kind drift.
            # Spark DATE/py-date columns arrive as object dtype (the
            # driver canonicalizes those fine), so exempt object ONLY
            # when the values are datetime-like — an object column of
            # Python ints (HUGEINT) must still flag
            def _datetime_object(s):
                if s.dtype.kind != 'O':
                    return False
                nn = s.dropna()
                import datetime
                return len(nn) == 0 or isinstance(
                    nn.iloc[0], (datetime.date, datetime.datetime, pd.Timestamp))
            if (g.dtype.kind != w.dtype.kind
                    and not _datetime_object(g) and not _datetime_object(w)
                    and not ({g.dtype.kind, w.dtype.kind} <= {'i', 'u'})):
                fails.append((q, f"col {c} dtype {g.dtype} vs {w.dtype} "
                              "(driver hash is type-sensitive)")); ok = False; break
            if g.dtype.kind == 'f' or w.dtype.kind == 'f':
                # BITWISE equality (incl. -0.0 vs 0.0): the driver hashes
                # exact values — allclose previously hid real failures
                ga = g.astype(float).to_numpy(); wa = w.astype(float).to_numpy()
                bad = (ga.view('int64') != wa.view('int64')) & ~(np.isnan(ga) & np.isnan(wa))
                if bad.any():
                    i = int(np.argmax(bad))
                    fails.append((q, f"col {c} differs, e.g. row {i}: {g.iloc[i]!r} vs {w.iloc[i]!r}")); ok = False; break
            else:
                if not g.astype(str).equals(w.astype(str)):
                    neq = g.astype(str) != w.astype(str)
                    i = int(np.argmax(neq.to_numpy()))
                    fails.append((q, f"col {c} differs, e.g. row {i}: {g.iloc[i]!r} vs {w.iloc[i]!r}")); ok = False; break
        if ok:
            passes.append(q)
    except Exception as e:
        fails.append((q, f"EXC {type(e).__name__}: {e}"))

# rows-only queries
rows_only = [d for d in os.listdir(outdir)
             if os.path.isdir(f"{outdir}/{d}") and d not in oracle]
for q in sorted(rows_only):
    files = glob.glob(f"{outdir}/{q}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    print(f"[rows-only] {q}: {n} rows" + ("  <-- EMPTY" if n == 0 else ""))

print(f"\nPASS {len(passes)}/{len(oracle)}")
for q, why in fails:
    print(f"FAIL {q}: {why}")
sys.exit(1 if fails else 0)
