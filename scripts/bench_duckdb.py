#!/usr/bin/env python3
"""DuckDB stand-in bench: times every oracle_sql.json query against a
parquet sf directory, min-of-N, mirroring the judge's same-machine
comparison method (and graft.Bench's min-of-3). Per-query wall timeout;
a query that exceeds it records the elapsed time and "dnf": true.

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> [reps=3] [timeoutSec=300]
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        # plain file (driver testdata) or Spark-written directory
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    best, dnf = {}, {}
    for name in sorted(oracle):
        sql = oracle[name]
        times = []
        for _ in range(reps):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                print(f"ERR {name}: {e}", file=sys.stderr)
                times.append(float("inf"))
                break
            times.append(time.time() - t0)
            if times[-1] > timeout:
                dnf[name] = True
                break
        best[name] = min(times)
        print(f"{name:30s} {best[name]:8.2f}{'  DNF' if name in dnf else ''}",
              file=sys.stderr)
    total = sum(v for v in best.values() if v != float("inf"))
    out = {"metric": "duckdb_total", "value": total, "unit": "sec",
           "queries": best, "sf": sf_dir, "reps": reps,
           "dnf": sorted(dnf)}
    print(json.dumps(out))

if __name__ == "__main__":
    main()
