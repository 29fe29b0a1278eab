#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet
dumps produced by graft.Verify plus oracle_sql.json, runs each oracle in
DuckDB over the same sf directory, and compares values with columns
sorted by name and rows sorted by all columns.

Usage: verify_local.py <sfDir> <verifyOutDir> [query ...]

VERIFY_ORACLE_TIMEOUT=<sec> (env) arms a per-oracle watchdog: a DuckDB
oracle that exceeds it is interrupted and charged as a loud DNF (counted
and listed, distinct from a value FAIL) — the big-SF legs need this
because some oracle spellings blow up super-linearly (dd15's recursive
closure DNF'd >300 s at sf1 while the engine ran it in seconds).
"""
import sys, os, json, glob, threading
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
    timeout = float(os.environ.get("VERIFY_ORACLE_TIMEOUT", "0"))

    def run_oracle(sql):
        """Execute with an optional watchdog; returns ('ok', df) /
        ('dnf', None) / raises the oracle's own error."""
        if timeout <= 0:
            return "ok", con.execute(sql).fetchdf()
        done = threading.Event()
        timed_out = []
        def watchdog():
            if done.wait(timeout):
                return
            timed_out.append(True)
            # re-interrupt until the query actually dies: an interrupt
            # that lands BEFORE execution starts is a no-op, so one shot
            # can race the executor and never fire
            while not done.is_set():
                con.interrupt()
                done.wait(0.2)
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        try:
            df = con.execute(sql).fetchdf()
            return "ok", df
        except Exception:
            if timed_out:
                return "dnf", None
            raise
        finally:
            done.set()
            if timed_out:
                # the watchdog's last interrupt can land AFTER this query
                # finished and kill the NEXT oracle (miscounted as a value
                # FAIL instead of a DNF): drain any pending interrupt with
                # a sacrificial no-op before the next query runs
                w.join(5)
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
    n_pass = n_fail = n_dnf = 0
    dnfs = []
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
            status, want = run_oracle(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if status == "dnf":
            print(f"DNF {name}: oracle exceeded {timeout:.0f}s (interrupted)")
            n_dnf += 1; dnfs.append(name); continue
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
    tail = f", {n_dnf} oracle DNF ({', '.join(dnfs)})" if n_dnf else ""
    print(f"\n{n_pass} passed, {n_fail} failed{tail}")
    # DNFs exit with a DISTINCT nonzero code: a too-tight timeout (or a
    # systemic oracle hang) must not silently degrade the value-exactness
    # gate to "exit 0 with fewer checks run". 1 = value failures, 3 = all
    # values that ran matched but some oracles never finished.
    sys.exit(1 if n_fail else (3 if n_dnf else 0))

if __name__ == "__main__":
    main()
