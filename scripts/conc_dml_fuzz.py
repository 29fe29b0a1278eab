#!/usr/bin/env python3
"""Driver for the concurrent-writer DML differential test.

Spawns TWO graft.tools.ConcDmlRun JVMs (roles a/b) against one shared
data directory, then validates, per sequence:

1. COMMIT INTEGRITY — every writer statement landed exactly ONE manifest
   commit on the contended table, and the union of all commit versions
   (setup + both writers) is a DENSE 0..N sequence: single winner per
   version, no lost or duplicated commit.
2. SERIALIZABILITY — replaying all committed statements in COMMIT ORDER
   through DuckDB reproduces graft's final table state exactly. The
   optimistic-retry path re-plans each losing statement against the
   fresh snapshot, so commit order IS a serial execution order; a
   divergence means some commit carried work planned against a stale
   snapshot (a lost update).

Usage: conc_dml_fuzz.py <sequences.jsonl> <sharedDir>
(sharedDir must be the directory both ConcDmlRun writers used; this
script runs them itself if the logs are absent.)
"""
import glob
import json
import os
import subprocess
import sys

import duckdb


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    picked = [tuple(r[i] for i in order) for r in rows]
    return sorted(picked, key=lambda r: tuple((v is None, str(type(v)), str(v))
                                              for v in r))


def run_writers(seq_file, shared):
    here = os.path.dirname(os.path.abspath(__file__))
    runner = os.path.join(here, "run.sh")
    procs = [subprocess.Popen(
        [runner, "graft.tools.ConcDmlRun", shared, role, seq_file],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for role in ("a", "b")]
    codes = [p.wait() for p in procs]
    return codes


def main():
    seq_file, shared = sys.argv[1], sys.argv[2]
    if not os.path.exists(os.path.join(shared, "log_a.jsonl")):
        codes = run_writers(seq_file, shared)
        print("writer exit codes: %s" % codes)

    logs = {"a": [], "b": []}
    for role in ("a", "b"):
        with open(os.path.join(shared, "log_%s.jsonl" % role)) as f:
            logs[role] = [json.loads(l) for l in f if l.strip()]

    n_pass = n_fail = 0
    for line in open(seq_file):
        line = line.strip()
        if not line:
            continue
        o = json.loads(line)
        seq = o["seq"]
        errs = [e for r in ("a", "b") for e in logs[r]
                if e.get("seq") == seq and "error" in e]
        if errs:
            print("FAIL seq%04d: writer error: %s" % (seq, errs[0]["error"][:300]))
            n_fail += 1
            continue
        recs = {r: [e for e in logs[r] if e.get("seq") == seq and "error" not in e]
                for r in ("a", "b")}
        setup = [e for e in recs["a"] if e["kind"] == "setup"]
        wa = [e for e in recs["a"] if e["kind"] == "a"]
        wb = [e for e in recs["b"] if e["kind"] == "b"]
        # the contended table's root: the one both writers commit to
        wroots = set(c["root"] for e in wa + wb for c in e["commits"])
        ok = True
        if len(wroots) != 1:
            print("FAIL seq%04d: writer commits span roots %s" % (seq, wroots))
            n_fail += 1
            continue
        troot = next(iter(wroots))
        # 1a. exactly one commit on t per writer statement
        for e in wa + wb:
            tv = [c["v"] for c in e["commits"] if c["root"] == troot]
            if len(tv) != 1:
                print("FAIL seq%04d %s[%d]: %d commits on t (%s)" % (
                    seq, e["kind"], e["i"], len(tv), e["sql"][:120]))
                ok = False
        # 1b. dense version space on t across setup + both writers
        all_v = sorted(c["v"] for e in setup + wa + wb
                       for c in e["commits"] if c["root"] == troot)
        if all_v != list(range(len(all_v))) or (all_v and all_v[0] != 0):
            print("FAIL seq%04d: version space not dense: %s" % (seq, all_v[:40]))
            ok = False
        if not ok:
            n_fail += 1
            continue
        # 2. serial replay in commit order
        ordered = sorted(
            ((next(c["v"] for c in e["commits"] if c["root"] == troot),
              o["%s_duck" % e["kind"]][e["i"]]) for e in wa + wb),
            key=lambda x: x[0])
        con = duckdb.connect()
        try:
            for s in o["setup_duck"]:
                con.execute(s)
            for _, stmts in ordered:
                for s in stmts:
                    con.execute(s)
        except Exception as e:
            print("FAIL seq%04d: duckdb replay error: %s" % (seq, str(e)[:300]))
            n_fail += 1
            con.close()
            continue
        for t in o["tables"]:
            dump = os.path.join(shared, "final_seq%04d_%s" % (seq, t))
            files = sorted(glob.glob(os.path.join(dump, "*.parquet")))
            if not files:
                print("FAIL seq%04d.%s: no parquet dump" % (seq, t))
                ok = False
                continue
            got_tbl = con.execute(
                "SELECT * FROM read_parquet(%s)" % repr(files)).arrow()
            want_tbl = con.execute("SELECT * FROM %s" % t).arrow()
            gcols, wcols = sorted(got_tbl.column_names), sorted(want_tbl.column_names)
            if gcols != wcols:
                print("FAIL seq%04d.%s: schema %s vs %s" % (seq, t, gcols, wcols))
                ok = False
                continue
            got = norm([tuple(r[c] for c in gcols) for r in got_tbl.to_pylist()], gcols)
            want = norm([tuple(r[c] for c in wcols) for r in want_tbl.to_pylist()], wcols)
            if got != want:
                print("FAIL seq%04d.%s: %d vs %d rows; first diff: %s vs %s" % (
                    seq, t, len(got), len(want),
                    next((g for g, w in zip(got, want) if g != w), got[:1]),
                    next((w for g, w in zip(got, want) if g != w), want[:1])))
                ok = False
        con.close()
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    # contention telemetry: how often the retry path actually fired is
    # visible as version interleaving — report the alternation rate
    print("%d passed, %d failed" % (n_pass, n_fail))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
