#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet
dumps produced by graft.Verify plus oracle_sql.json, runs each oracle in
DuckDB over the same sf directory, and compares values with columns
sorted by name and rows sorted by all columns.

Usage: verify_local.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # tz-aware → naive UTC so Spark (UTC-adjusted) vs DuckDB (naive) match
    for c in df.columns:
        if pd.api.types.is_datetime64tz_dtype(df[c]):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written directory parquet (sf1 legs)
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only: {len(got)} rows)")
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        kind_bad = [c for c in g.columns if g[c].dtype.kind != w[c].dtype.kind
                    and {g[c].dtype.kind, w[c].dtype.kind} - {"O", "b"}]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch {[(c, g[c].dtype.kind, w[c].dtype.kind) for c in kind_bad]}")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n  {str(e)[:500]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
