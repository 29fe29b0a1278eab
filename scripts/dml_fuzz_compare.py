#!/usr/bin/env python3
"""DuckDB half of the DML-sequence differential test: replays each
generated sequence's `duck` statements in a FRESH in-memory DuckDB and
compares every table's final state against the parquet dumped by
graft.tools.DmlFuzzRun — columns sorted by name, rows sorted by value
(None-first), exact equality. A `seq<i>.error` file from the runner or
a DuckDB replay error is a loud FAIL.

Usage: dml_fuzz_compare.py <sequences.jsonl> <outDir>
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


def main():
    seq_file, out_dir = sys.argv[1], sys.argv[2]
    n_pass = n_fail = 0
    for line in open(seq_file):
        line = line.strip()
        if not line:
            continue
        o = json.loads(line)
        name = "seq%04d" % o["seq"]
        if os.path.exists(os.path.join(out_dir, name + ".error")):
            print("FAIL %s: graft runner error: %s" %
                  (name, open(os.path.join(out_dir, name + ".error")).read()[:300]))
            n_fail += 1
            continue
        con = duckdb.connect()
        try:
            for s in o["duck"]:
                con.execute(s)
        except Exception as e:
            print("FAIL %s: duckdb replay error: %s" % (name, str(e)[:300]))
            n_fail += 1
            continue
        ok = True
        for t in o["tables"]:
            dump = os.path.join(out_dir, "%s_%s" % (name, t))
            files = sorted(glob.glob(os.path.join(dump, "*.parquet")))
            if not files:
                print("FAIL %s.%s: no parquet dump" % (name, t))
                ok = False
                continue
            got_tbl = con.execute(
                "SELECT * FROM read_parquet(%s)" % repr(files)).arrow()
            want_tbl = con.execute("SELECT * FROM %s" % t).arrow()
            # the final column SET is part of the differential (ALTER
            # TABLE ADD/DROP COLUMN evolves it); order is not
            gcols = sorted(got_tbl.column_names)
            wcols = sorted(want_tbl.column_names)
            if gcols != wcols:
                print("FAIL %s.%s: schema %s vs %s" % (name, t, gcols, wcols))
                ok = False
                continue
            cols = gcols
            got = norm([tuple(r[c] for c in cols) for r in got_tbl.to_pylist()], cols)
            want = norm([tuple(r[c] for c in cols) for r in want_tbl.to_pylist()], cols)
            if got != want:
                print("FAIL %s.%s: %d vs %d rows; first diff: %s vs %s" % (
                    name, t, len(got), len(want),
                    next((g for g, w in zip(got, want) if g != w), got[:1]),
                    next((w for g, w in zip(got, want) if g != w), want[:1])))
                ok = False
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        con.close()
    print("%d passed, %d failed" % (n_pass, n_fail))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
