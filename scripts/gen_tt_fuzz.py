#!/usr/bin/env python3
"""Time-travel / RESTORE / VACUUM differential fuzz generator — the
retention-machinery layer the plain DML fuzz (gen_dml_fuzz.py) never
touches: it only ever compared FINAL states, so version history,
`t('<ts>')` reads, rollbacks and retention windows went unfuzzed.

Each sequence is a program of entries over tables fa/fb:

  {"k":"sql", "t":T, "g":stmt, "d":[duck...]}   one single-commit DML
  {"k":"tt", "t":T, "v":ver, "p":prefix}        pinned historical read:
        graft dumps `SELECT * FROM T('<ts of version v>')`; the model
        re-executes the program PREFIX (entries [0,p)) in a fresh DuckDB
        and the states must match exactly
  {"k":"restore", "t":T, "v":ver, "p":prefix, "g":"RESTORE TABLE ..."}
        graft rolls T back by committing version v's file set + schema;
        the model replaces T with the prefix-replay state (recursively —
        a prefix may itself contain restores)
  {"k":"vacuum", "t":T, "g":"VACUUM TABLE ...", "probe_dead":v|null,
   "probe_live":v}
        after the vacuum, reading version probe_dead must FAIL LOUDLY
        (its manifest is gone) and probe_live must still read — the
        retention-window contract, asserted by the runner

Version bookkeeping mirrors the engine exactly: CREATE commits version
0, every DML/RESTORE commits exactly one version. ALTER state (the
generator's live extra columns) snapshots per version and ROLLS BACK on
restore, because RESTORE restores the schema too. tt/restore targets
stay inside the live retention window (minLive) so only the vacuum
probes ever read dead versions.

Usage: gen_tt_fuzz.py <nseq> <seed> > sequences.jsonl
"""
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_dml_fuzz import Gen  # noqa: E402


def gen_sequence(rnd, seq):
    g = Gen(rnd, seq)
    prog = []
    ver = {}        # table -> current version
    minlive = {}    # table -> oldest still-readable version
    # VACUUM ... RETAIN n PERSISTS the table's standing retention window
    # (GraftTable.setRetention — the background sweep honors it too), so a
    # later BARE vacuum uses the persisted n, not the default 1. The
    # model must track it or it mispredicts which versions die (seed 402
    # taught this: 4 false dead-version probes before this line existed).
    retention = {"fa": 1, "fb": 1}
    snaps = {"fa": {}, "fb": {}}  # table -> version -> extra-columns copy
    # table -> version -> prog prefix length whose replay IS that version
    verprefix = {"fa": {}, "fb": {}}

    def commit(t):
        ver[t] = ver.get(t, -1) + 1
        snaps[t][ver[t]] = list(g.extra[t])
        verprefix[t][ver[t]] = len(prog)  # includes the entry just appended

    def sql(t, gs, ds):
        prog.append({"k": "sql", "t": t, "g": gs, "d": ds})
        commit(t)

    for t in ("fa", "fb"):
        c = "CREATE TABLE %s (id BIGINT, a BIGINT, b BIGINT, s VARCHAR)" % t
        sql(t, c, [c])
        minlive[t] = 0
        for _ in range(rnd.randint(1, 2)):
            gs, ds = g.ins_values(t)
            sql(t, gs[0], ds)

    for _ in range(rnd.randint(8, 14)):
        t = rnd.choice(["fa", "fb"])
        o = "fb" if t == "fa" else "fa"
        op = rnd.choices(
            ["ins_values", "ins_select", "update", "delete", "merge",
             "add_column", "drop_column", "tt", "restore", "vacuum"],
            weights=[16, 10, 16, 10, 10, 5, 3, 14, 9, 7])[0]
        if op == "tt":
            v = rnd.randint(minlive[t], ver[t])
            prog.append({"k": "tt", "t": t, "v": v, "p": verprefix[t][v]})
        elif op == "restore":
            v = rnd.randint(minlive[t], ver[t])
            prog.append({"k": "restore", "t": t, "v": v, "p": verprefix[t][v],
                         "g": "RESTORE TABLE %s TO VERSION AS OF %d" % (t, v)})
            # a restore COMMITS: bump the version, roll the ALTER state
            # back to the restored snapshot
            g.extra[t] = list(snaps[t][v])
            commit(t)
        elif op == "vacuum":
            retain = rnd.choice([0, 0, 2])  # 0 = bare (persisted window)
            stmt = ("VACUUM TABLE %s" % t if retain == 0
                    else "VACUUM TABLE %s RETAIN %d VERSIONS" % (t, retain))
            if retain:
                retention[t] = retain
            eff = retention[t]
            new_min = max(minlive[t], ver[t] - (eff - 1))
            probe_dead = minlive[t] if minlive[t] < new_min else None
            prog.append({"k": "vacuum", "t": t, "g": stmt,
                         "probe_dead": probe_dead, "probe_live": ver[t]})
            minlive[t] = new_min
        else:
            if op == "ins_values":
                gs, ds = g.ins_values(t)
            elif op == "ins_select":
                gs, ds = g.ins_select(t, o)
            elif op == "update":
                gs, ds = g.update(t)
            elif op == "delete":
                gs, ds = g.delete(t)
            elif op == "add_column":
                gs, ds = g.add_column(t)
            elif op == "drop_column":
                gs, ds = g.drop_column(t)
            else:
                gs, ds = g.merge(t, o)
            assert len(gs) == 1, gs
            sql(t, gs[0], ds)
    return {"seq": seq, "tables": ["fa", "fb"], "prog": prog}


def main():
    n, seed = int(sys.argv[1]), int(sys.argv[2])
    rnd = random.Random(seed)
    for i in range(n):
        print(json.dumps(gen_sequence(rnd, i)))


if __name__ == "__main__":
    main()
