#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against the DuckDB oracles and diff. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable row sort across dtypes
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)

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
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows) {'PASS' if len(got) > 0 else 'EMPTY'}")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"{name}: COLUMN MISMATCH spark={list(g.columns)} duckdb={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(g)} duckdb={len(w)}")
            n_fail += 1
            continue
        for c in g.columns:
            if str(g[c].dtype) != str(w[c].dtype):
                print(f"  [warn] {name}.{c}: dtype spark={g[c].dtype} duckdb={w[c].dtype}")
        bad = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    eq = ((a.astype(float) - b.astype(float)).abs() < 1e-9) | (a.isna() & b.isna())
                else:
                    eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    bad.append((c, a.iloc[i], b.iloc[i], int((~eq).sum())))
            except Exception as e:
                bad.append((c, "cmp-error", str(e), -1))
        if bad:
            print(f"{name}: VALUE MISMATCH {bad[:3]}")
            n_fail += 1
        else:
            print(f"{name}: PASS ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
