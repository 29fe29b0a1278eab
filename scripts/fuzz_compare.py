#!/usr/bin/env python3
"""DuckDB half of the randomized differential test: run every generated
query (gen_fuzz.py) in DuckDB over the same parquet and compare values
exactly against FuzzRun's Spark dumps — columns sorted by name, rows
sorted by all columns (the driver comparator's method). A Spark-side
`.error` dump, a DuckDB error, or any value mismatch is a loud FAIL.

Usage: fuzz_compare.py <sfDir> <queries.sql> <sparkOutDir>
"""
import glob
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, queries_file, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        # GenScale-written events carry raw BIGINT-ns ts; surface as µs
        # timestamps exactly like graft.Tables.load (bench_duckdb's rule)
        if t == "events":
            typ = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if typ and typ[0] == "BIGINT":
                con.execute("CREATE OR REPLACE VIEW events AS "
                            f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                            f"FROM '{sf_dir}/events.parquet'")
    queries = [q.strip() for q in open(queries_file) if q.strip()]
    passed, failed = 0, []
    for i, q in enumerate(queries):
        name = f"fz{i:04d}"
        if os.path.exists(f"{out_dir}/{name}.error"):
            failed.append((name, "spark error: " +
                           open(f"{out_dir}/{name}.error").read().splitlines()[-1]))
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failed.append((name, "no spark output"))
            continue
        try:
            oracle = norm(con.execute(q).df())
        except Exception as e:
            failed.append((name, f"duckdb error: {e}"))
            continue
        spark = norm(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        if list(spark.columns) != list(oracle.columns):
            failed.append((name, f"schema {list(spark.columns)} vs {list(oracle.columns)}"))
            continue
        if len(spark) != len(oracle):
            failed.append((name, f"rows {len(spark)} vs {len(oracle)}"))
            continue
        try:
            pd.testing.assert_frame_equal(spark, oracle, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            passed += 1
        except AssertionError as e:
            failed.append((name, str(e).splitlines()[0]))
    for name, why in failed:
        q = queries[int(name[2:])]
        print(f"FAIL {name}: {why}\n  {q}")
    print(f"{passed} passed, {len(failed)} failed (of {len(queries)})")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
