#!/usr/bin/env python3
"""DuckDB stand-in bench: times every oracle_sql.json query against a
parquet sf directory, min-of-N, mirroring the judge's same-machine
comparison method (and graft.Bench's min-of-3). The per-query wall
timeout is enforced by a watchdog thread calling con.interrupt(), so a
hung query cannot block the run; queries that error are listed in
"errors" (and excluded from the total LOUDLY, not silently).

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> [reps=3] [timeoutSec=300]
"""
import sys, os, json, time, threading
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
        # Spark-written scale-up data (tools.GenScale) carries events.ts
        # as raw BIGINT nanos; surface it as a µs TIMESTAMP exactly like
        # graft.Tables.load does on the Spark side (ns // 1000 → µs)
        if t == "events":
            typ = con.execute(
                "SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if typ and typ[0] == "BIGINT":
                con.execute(
                    "CREATE OR REPLACE VIEW events AS "
                    f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM '{path}'")
    best, dnf, errors = {}, {}, {}
    for name in sorted(oracle):
        sql = oracle[name]
        times = []
        for _ in range(reps):
            fired = threading.Event()
            def interrupt():
                fired.set()
                con.interrupt()
            watchdog = threading.Timer(timeout, interrupt)
            watchdog.start()
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                elapsed = time.time() - t0
                if fired.is_set():
                    dnf[name] = True
                    times.append(elapsed)
                else:
                    print(f"ERR {name}: {e}", file=sys.stderr)
                    errors[name] = str(e)
                break
            finally:
                watchdog.cancel()
            times.append(time.time() - t0)
        if times:
            best[name] = min(times)
        flag = "  DNF" if name in dnf else ("  ERR" if name in errors else "")
        print(f"{name:30s} {best.get(name, float('nan')):8.2f}{flag}",
              file=sys.stderr)
    total = sum(best.values())
    out = {"metric": "duckdb_total", "value": total, "unit": "sec",
           "queries": best, "sf": sf_dir, "reps": reps,
           "dnf": sorted(dnf), "errors": errors,
           "complete": not errors and not dnf}
    print(json.dumps(out))

if __name__ == "__main__":
    main()
