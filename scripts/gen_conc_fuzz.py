#!/usr/bin/env python3
"""Concurrent-writer DML fuzz generator: emits N seeded sequences, each
with a SETUP program (CREATE + seed the contended table `t` and a STATIC
source table `src`) and TWO writer programs ("a", "b") that two separate
JVMs (graft.tools.ConcDmlRun) execute concurrently against the same
shared data directory.

Every writer statement is (1) a SINGLE manifest commit in graft, (2) a
deterministic pure function of the statement and the pre-state, and
(3) DuckDB-replayable — so after the run, replaying all committed
statements in COMMIT ORDER (from the versions each writer logged) must
reproduce graft's final state exactly; any divergence means the
optimistic-retry path committed work planned against a stale snapshot
(a lost update). Writers only ever SELECT from `src`, which nobody
mutates after setup — so the statement mix is free of read-write
races above the storage layer, and serializability of the storage
commits is the whole question.

Portability rules inherited from gen_dml_fuzz.py (|| concat, no
division, bounded arithmetic, MERGE decomposed for DuckDB with
snapshot-matched-keys). Writer-distinct counters keep MERGE temp-table
names and ALTER column names collision-free across writers.

Usage: gen_conc_fuzz.py <nseq> <seed> > sequences.jsonl
Each line: {"seq": i, "tables": ["t"], "setup": [...], "a": [...],
            "b": [...], "setup_duck": [...], "a_duck": [[...]...],
            "b_duck": [[...]...]}
(`a_duck[i]` is the DuckDB replay of writer-a statement i — a LIST,
because MERGE decomposes into several statements.)
"""
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_dml_fuzz import Gen  # noqa: E402


def writer_gen(rnd, seq, tag):
    g = Gen(rnd, seq)
    # re-point the fragment pool at the concurrent tables: `t` is the
    # contended target, `src` the static source
    g.next_id = {"t": 1, "src": 1}
    g.extra = {"t": [], "src": []}
    # writer-distinct counters: MERGE temp names + ALTER column names
    g.merge_n = 1000 if tag == "a" else 2000
    g.colctr = 0 if tag == "a" else 500
    return g


def gen_writer_stmts(g, rnd, n):
    """n statements over table t (src static). Returns (graft, duck)
    where graft[i] is ONE statement and duck[i] a replay LIST."""
    graft, duck = [], []
    for _ in range(n):
        # ins_self / merge_self read the CONTENDED TARGET itself — the
        # write-skew shape (INSERT INTO t SELECT FROM t under contention)
        # that distinguishes full serializability from WriteSerializable:
        # the engine must rebuild the self-referencing input frame inside
        # its retry loop, or the commit-order DuckDB replay diverges.
        op = rnd.choices(
            ["ins_values", "ins_select", "update", "delete", "merge",
             "truncate", "add_column", "drop_column", "ins_self", "merge_self"],
            weights=[18, 12, 22, 14, 10, 2, 4, 2, 10, 6])[0]
        if op == "ins_values":
            gs, ds = g.ins_values("t")
        elif op == "ins_select":
            gs, ds = g.ins_select("t", "src")
        elif op == "ins_self":
            gs, ds = g.ins_select("t", "t")
        elif op == "merge_self":
            gs, ds = g.merge("t", "t")
        elif op == "update":
            gs, ds = g.update("t")
        elif op == "delete":
            gs, ds = g.delete("t")
        elif op == "truncate":
            gs, ds = g.truncate("t")
        elif op == "add_column":
            gs, ds = g.add_column("t")
        elif op == "drop_column":
            gs, ds = g.drop_column("t")
        else:
            gs, ds = g.merge("t", "src")
        assert len(gs) == 1, gs
        graft.append(gs[0])
        duck.append(ds)
    return graft, duck


def gen_sequence(rnd, seq):
    gs = writer_gen(rnd, seq, "setup")
    setup, setup_duck = [], []
    for t in ("t", "src"):
        setup.append("DROP TABLE IF EXISTS %s" % t)
        setup_duck.append("DROP TABLE IF EXISTS %s" % t)
        c = "CREATE TABLE %s (id BIGINT, a BIGINT, b BIGINT, s VARCHAR)" % t
        setup.append(c)
        setup_duck.append(c)
        for _ in range(rnd.randint(2, 4)):
            g1, d1 = gs.ins_values(t)
            setup += g1
            setup_duck += d1
    ga = writer_gen(rnd, seq, "a")
    gb = writer_gen(rnd, seq, "b")
    # seed-insert ids came from the setup generator; start writer ids
    # past them so freshly generated rows stay mostly distinct
    for g in (ga, gb):
        g.next_id["t"] = gs.next_id["t"]
        g.next_id["src"] = gs.next_id["src"]
    n = rnd.randint(4, 8)
    a, a_duck = gen_writer_stmts(ga, rnd, n)
    b, b_duck = gen_writer_stmts(gb, rnd, n)
    return {"seq": seq, "tables": ["t"], "setup": setup, "a": a, "b": b,
            "setup_duck": setup_duck, "a_duck": a_duck, "b_duck": b_duck}


def main():
    n, seed = int(sys.argv[1]), int(sys.argv[2])
    rnd = random.Random(seed)
    for i in range(n):
        print(json.dumps(gen_sequence(rnd, i)))


if __name__ == "__main__":
    main()
