#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against DuckDB oracles, compare sorted-by-column-name values.
Usage: python3 tools/check.py <sfDir> <outDir> [keys...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    # sort rows by all columns for order-insensitive compare, but also
    # report original order match separately
    return df

def canon(df):
    out = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            col = col.map(lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x)
        out.append(col.reset_index(drop=True))
    return pd.concat(out, axis=1)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        pdir = f"{out_dir}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        try:
            mine = pd.read_parquet(pdir)
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__} {e}"); n_fail += 1; continue
        mine, want = canon(norm(mine)), canon(norm(want))
        if list(mine.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(mine) != len(want):
            print(f"FAIL {name}: rows {len(mine)} vs {len(want)}"); n_fail += 1; continue
        # exact value compare (as the driver hashes); also detect
        # row-order-only mismatches
        ok = True
        for c in mine.columns:
            a, b = mine[c].to_numpy(), want[c].to_numpy()
            eq = (pd.Series(a) == pd.Series(b)) | (pd.isna(pd.Series(a)) & pd.isna(pd.Series(b)))
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                srt_a = mine.sort_values(list(mine.columns)).reset_index(drop=True)
                srt_b = want.sort_values(list(want.columns)).reset_index(drop=True)
                order_only = srt_a.equals(srt_b)
                print(f"FAIL {name}: col {c} row {i}: {a[i]!r} vs {b[i]!r}"
                      + (" [ROW ORDER ONLY]" if order_only else ""))
                ok = False
                break
        if ok:
            print(f"PASS {name} ({len(mine)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
