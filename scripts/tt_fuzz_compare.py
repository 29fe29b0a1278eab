#!/usr/bin/env python3
"""Model half of the time-travel / RESTORE / VACUUM differential fuzz:
replays each gen_tt_fuzz.py program in DuckDB, modeling

  - "sql"      → execute the duck statements;
  - "tt"       → the expected historical state is a FRESH replay of the
                 program prefix [0, p); compared exactly against the
                 parquet graft dumped for `SELECT * FROM t('<ts>')`;
  - "restore"  → replace the table with the prefix-replay state
                 (recursive: a prefix may contain earlier restores);
  - "vacuum"   → no model effect; the runner's checks.jsonl must report
                 dead_ok (out-of-window read failed loudly) and live_ok
                 (retained version still reads) for the entry.

Final table states compare exactly, as in dml_fuzz_compare.py.

Usage: tt_fuzz_compare.py <sequences.jsonl> <outDir>
"""
import glob
import json
import os
import sys

import duckdb


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    picked = [tuple(r[i] for i in order) for r in rows]
    return sorted(picked, key=lambda r: tuple((v is None, str(type(v)), str(v))
                                              for v in r))


def transfer(src_con, dst_con, table):
    """Replace `table` in dst with src's current state (schema included)."""
    tbl = src_con.execute("SELECT * FROM %s" % table).arrow()
    dst_con.execute("DROP TABLE IF EXISTS %s" % table)
    dst_con.register("__xfer", tbl)
    dst_con.execute("CREATE TABLE %s AS SELECT * FROM __xfer" % table)
    dst_con.unregister("__xfer")


def replay(prog, upto):
    """Fresh DuckDB holding the model state after prog[0:upto]."""
    con = duckdb.connect()
    for e in prog[:upto]:
        if e["k"] == "sql":
            for s in e["d"]:
                con.execute(s)
        elif e["k"] == "restore":
            sub = replay(prog, e["p"])
            transfer(sub, con, e["t"])
            sub.close()
        # tt / vacuum: read-only or graft-internal — no model effect
    return con


def compare_dump(con, table_or_query, dump, label):
    files = sorted(glob.glob(os.path.join(dump, "*.parquet")))
    if not files:
        print("FAIL %s: no parquet dump at %s" % (label, dump))
        return False
    got_tbl = con.execute("SELECT * FROM read_parquet(%s)" % repr(files)).arrow()
    want_tbl = con.execute("SELECT * FROM %s" % table_or_query).arrow()
    gcols, wcols = sorted(got_tbl.column_names), sorted(want_tbl.column_names)
    if gcols != wcols:
        print("FAIL %s: schema %s vs %s" % (label, gcols, wcols))
        return False
    got = norm([tuple(r[c] for c in gcols) for r in got_tbl.to_pylist()], gcols)
    want = norm([tuple(r[c] for c in wcols) for r in want_tbl.to_pylist()], wcols)
    if got != want:
        print("FAIL %s: %d vs %d rows; first diff: %s vs %s" % (
            label, len(got), len(want),
            next((g for g, w in zip(got, want) if g != w), got[:1]),
            next((w for g, w in zip(got, want) if g != w), want[:1])))
        return False
    return True


def main():
    seq_file, out_dir = sys.argv[1], sys.argv[2]
    checks = {}
    cpath = os.path.join(out_dir, "checks.jsonl")
    if os.path.exists(cpath):
        for l in open(cpath):
            c = json.loads(l)
            checks[(c["seq"], c["idx"])] = c
    n_pass = n_fail = 0
    n_tt = n_vac = 0
    for line in open(seq_file):
        line = line.strip()
        if not line:
            continue
        o = json.loads(line)
        seq, prog = o["seq"], o["prog"]
        name = "seq%04d" % seq
        if os.path.exists(os.path.join(out_dir, name + ".error")):
            print("FAIL %s: graft runner error: %s" % (
                name, open(os.path.join(out_dir, name + ".error")).read()[:300]))
            n_fail += 1
            continue
        ok = True
        con = duckdb.connect()
        try:
            for idx, e in enumerate(prog):
                if e["k"] == "sql":
                    for s in e["d"]:
                        con.execute(s)
                elif e["k"] == "tt":
                    n_tt += 1
                    sub = replay(prog, e["p"])
                    # the pinned read sees version v = state at the prefix
                    exp = sub.execute("SELECT * FROM %s" % e["t"]).arrow()
                    sub2 = duckdb.connect()
                    sub2.register("__exp", exp)
                    if not compare_dump(sub2, "__exp",
                                        os.path.join(out_dir, "%s_c%d" % (name, idx)),
                                        "%s tt@%d %s.v%d" % (name, idx, e["t"], e["v"])):
                        ok = False
                    sub2.close()
                    sub.close()
                elif e["k"] == "restore":
                    sub = replay(prog, e["p"])
                    transfer(sub, con, e["t"])
                    sub.close()
                elif e["k"] == "vacuum":
                    n_vac += 1
                    c = checks.get((seq, idx))
                    if not c or not c.get("dead_ok") or not c.get("live_ok"):
                        print("FAIL %s vacuum@%d: %s" % (name, idx, c))
                        ok = False
        except Exception as e:
            print("FAIL %s: duckdb replay error: %s" % (name, str(e)[:300]))
            ok = False
        if ok:
            for t in o["tables"]:
                if not compare_dump(con, t, os.path.join(out_dir, "%s_%s" % (name, t)),
                                    "%s final %s" % (name, t)):
                    ok = False
        con.close()
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    print("%d passed, %d failed (%d tt checks, %d vacuum probes)"
          % (n_pass, n_fail, n_tt, n_vac))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
