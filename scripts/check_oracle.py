#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: for each query output written by
graft.Verify, run the corresponding oracle SQL in DuckDB over the same
testdata tables and diff exactly (columns sorted by name, rows sorted,
values compared after dtype normalization). Usage:

  python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # bytes -> hex, lists -> tuples for comparability
            df[c] = s.map(lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                          else tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif str(s.dtype).startswith("datetime64"):
            df[c] = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
    sort_cols = [c for c in df.columns if df[c].map(lambda v: not isinstance(v, tuple)).all()]
    df = df.sort_values(by=sort_cols, kind="mergesort").reset_index(drop=True) if sort_cols else df
    return df

n_pass = n_fail = 0
fails = []
for name in sorted(oracle):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no output dir"); n_fail += 1; fails.append(name); continue
    try:
        mine = pd.read_parquet(res_path)
        want = con.sql(oracle[name]).fetchdf()
        # The driver's comparator crashes on top-level array/map columns
        # (pandas can't sort them). Fail loudly here so local green implies
        # driver green — don't paper over with tuple conversion.
        bad = [c for df in (mine, want) for c in df.columns
               if df[c].dtype == object and len(df) > 0
               and any(isinstance(v, (list, np.ndarray, dict)) for v in df[c].head(20))]
        if bad:
            print(f"FAIL {name}: driver-unhashable array/map columns {sorted(set(bad))}")
            n_fail += 1; fails.append(name); continue
        a, b = normalize(mine.copy()), normalize(want.copy())
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs oracle {list(b.columns)}")
            n_fail += 1; fails.append(name); continue
        # The driver's hash is dtype-aware: int64 10 != float64 10.0. An
        # uncast DuckDB window SUM (HUGEINT -> float64/object) passes a
        # value-== compare but fails the driver. Fail loudly on kind
        # mismatch so local green implies driver green (r7 item 2).
        dbad = []
        for c in a.columns:
            ka, kb = a[c].dtype.kind, b[c].dtype.kind
            if ka == kb:
                continue
            if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
                # allow only if the float side is NULL-promoted ints
                # (pandas promotes int+NULL to float on BOTH paths)
                fs_ = a[c] if ka == "f" else b[c]
                if fs_.isna().any() and fs_.dropna().map(float.is_integer).all():
                    continue
            dbad.append(f"{c}: {a[c].dtype} vs {b[c].dtype}")
        if dbad:
            print(f"FAIL {name}: dtype mismatch (driver hash would differ): "
                  + "; ".join(dbad[:4]))
            n_fail += 1; fails.append(name); continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs oracle {len(b)}")
            n_fail += 1; fails.append(name); continue
        diffs = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                eq = ((av.isna() & bv.isna()) | (av == bv))
            else:
                av2 = av.astype(object).where(~av.isna(), None)
                bv2 = bv.astype(object).where(~bv.isna(), None)
                eq = pd.Series([x == y or (x is None and y is None) for x, y in zip(av2, bv2)])
            if not eq.all():
                i = int(np.argmin(eq.values))
                diffs.append(f"col {c}: row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r} ({int((~eq).sum())} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3])); n_fail += 1; fails.append(name)
        else:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    except Exception as e:
        print(f"FAIL {name}: exception {type(e).__name__}: {e}")
        n_fail += 1; fails.append(name)

# rows-only queries (no oracle): check output exists and has rows
all_dirs = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
for name in sorted(all_dirs - set(oracle)):
    try:
        n = len(pd.read_parquet(f"{out_dir}/{name}"))
        print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only, {n} rows)")
        if n > 0: n_pass += 1
        else: n_fail += 1; fails.append(name)
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; fails.append(name)

print(f"\n{n_pass} pass, {n_fail} fail" + (f": {fails}" if fails else ""))
sys.exit(1 if n_fail else 0)
