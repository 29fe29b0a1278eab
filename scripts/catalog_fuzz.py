#!/usr/bin/env python3
"""Cross-process CATALOG concurrency differential.

Generates seeded sequences of catalog DDL + DML, races them from TWO
graft.tools.CatalogRaceRun JVMs (roles a/b) against one fresh data
directory per sequence, then asserts from the on-disk state + both
outcome logs:

  1. EXACTLY-ONE-WINNER — contended CREATE TABLE / DROP TABLE /
     RENAME / CREATE SCHEMA ops (both roles attempt the same name)
     succeed exactly once across the two processes; the loser gets the
     proper already-exists/unknown error, never a half-applied state.
  2. CATALOG<->MANIFEST CONSISTENCY — every cataloged table has a
     readable manifest log; every table directory on disk is either
     cataloged or in the dropped-tables ledger (no orphaned storage,
     no dangling catalog rows).
  3. ZERO LOST DML — tables nobody drops contain exactly one row per
     successful INSERT (DuckDB over the latest manifest's files);
     INSERTs racing a DROP either succeed (serialized before it) or
     fail with an unknown-table error.

The catalog's versioned put-if-absent commits + replayed mutations
(Catalog.mutate) are the layer under test — the analog of the
reference metastore's SQL transactions (src/repository/interface.rs).

Usage: catalog_fuzz.py <nseq> <seed> [sharedDir]
"""
import json
import os
import random
import re
import shutil
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_sequence(rnd, seq):
    setup, a_ops, b_ops = [], [], []
    a_meta, b_meta = [], []

    def table(name):
        setup.append("CREATE TABLE %s (id BIGINT, v BIGINT)" % name)

    for t in ("t_ins_a", "t_ins_b", "t_ins_sh", "cd1", "cd2", "r1", "r2",
              "dd1", "dd2"):
        table(t)
    setup.append("INSERT INTO t_ins_sh VALUES (0, 0)")

    def op(ops, meta, sql, kind, **kw):
        ops.append(sql)
        meta.append(dict(kind=kind, **kw))

    # contended ops: both roles attempt the same logical mutation
    for ct in ("ct1", "ct2"):
        for ops, meta in ((a_ops, a_meta), (b_ops, b_meta)):
            op(ops, meta, "CREATE TABLE %s (x BIGINT)" % ct, "create_ct", name=ct)
    for cd in ("cd1", "cd2"):
        for ops, meta in ((a_ops, a_meta), (b_ops, b_meta)):
            op(ops, meta, "DROP TABLE %s" % cd, "drop_cd", name=cd)
    for r in ("r1", "r2"):
        op(a_ops, a_meta, "ALTER TABLE %s RENAME TO %sa" % (r, r), "rename", name=r, to=r + "a")
        op(b_ops, b_meta, "ALTER TABLE %s RENAME TO %sb" % (r, r), "rename", name=r, to=r + "b")
    for ops, meta in ((a_ops, a_meta), (b_ops, b_meta)):
        op(ops, meta, "CREATE SCHEMA sc_cont", "create_schema", name="sc_cont")

    # private DDL (disjoint names — must always succeed)
    op(a_ops, a_meta, "CREATE TABLE pa1 (x BIGINT)", "create_priv", name="pa1")
    op(b_ops, b_meta, "CREATE TABLE pb1 (x BIGINT)", "create_priv", name="pb1")

    # DML on never-dropped tables: unique ids (a = even, b = odd)
    for i in range(rnd.randint(3, 6)):
        t = rnd.choice(["t_ins_a", "t_ins_sh"])
        op(a_ops, a_meta, "INSERT INTO %s VALUES (%d, %d)" % (t, 2 * i + 2, seq),
           "insert", table=t, id=2 * i + 2)
    for i in range(rnd.randint(3, 6)):
        t = rnd.choice(["t_ins_b", "t_ins_sh"])
        op(b_ops, b_meta, "INSERT INTO %s VALUES (%d, %d)" % (t, 2 * i + 1, seq),
           "insert", table=t, id=2 * i + 1)

    # DML racing DROP: role a inserts into dd*, role b drops them
    for j, dd in enumerate(("dd1", "dd2")):
        for k in range(rnd.randint(1, 2)):
            op(a_ops, a_meta, "INSERT INTO %s VALUES (%d, %d)" % (dd, 100 + 10 * j + k, seq),
               "insert_dd", table=dd)
        op(b_ops, b_meta, "DROP TABLE %s" % dd, "drop_dd", name=dd)

    # shuffle each role's ops (meta stays index-aligned)
    for ops, meta in ((a_ops, a_meta), (b_ops, b_meta)):
        order = list(range(len(ops)))
        rnd.shuffle(order)
        ops[:] = [ops[i] for i in order]
        meta[:] = [meta[i] for i in order]

    return {"seq": seq, "setup": setup, "a": a_ops, "b": b_ops,
            "a_meta": a_meta, "b_meta": b_meta}


# --- on-disk state readers ---------------------------------------------------

def load_catalog(data_dir):
    catdir = os.path.join(data_dir, "_catalog")
    vs = sorted(f for f in os.listdir(catdir) if re.match(r"v\d+\.json$", f))
    with open(os.path.join(catdir, vs[-1])) as f:
        return json.load(f)


def latest_manifest(root):
    logdir = os.path.join(root, "_log")
    if not os.path.isdir(logdir):
        return None
    vs = sorted(int(m.group(1)) for f in os.listdir(logdir)
                if (m := re.match(r"v(\d+)\.json$", f)))
    if not vs:
        return None
    with open(os.path.join(logdir, "v%020d.json" % vs[-1])) as f:
        return json.load(f)


def check_sequence(o, shared, logs, fails):
    seq = o["seq"]
    data_dir = os.path.join(shared, "data_seq%04d" % seq)

    def fail(msg):
        fails.append("seq%04d: %s" % (seq, msg))

    recs = {r: {e["i"]: e for e in logs[r] if e.get("seq") == seq and "i" in e}
            for r in ("a", "b")}
    herr = [e for r in ("a", "b") for e in logs[r]
            if e.get("seq") == seq and "error" in e]
    if herr:
        fail("harness error: %s" % herr[0]["error"][:300])
        return
    cat = load_catalog(data_dir)
    public = cat["dbs"]["default"].get("public", {})
    schemas = set(cat["dbs"]["default"].keys())
    dropped = {d["uuid"] for d in cat["dropped"]}

    # 1. per-kind exactly-one-winner bookkeeping
    outcomes = {}  # (kind, name) -> list[(role, ok, err, meta)]
    for role in ("a", "b"):
        for i, e in recs[role].items():
            m = o["%s_meta" % role][i]
            outcomes.setdefault((m["kind"], m.get("name") or m.get("table")),
                                []).append((role, e["ok"], e.get("err", ""), m))
    for (kind, name), xs in sorted(outcomes.items()):
        wins = sum(1 for _, ok, _, _ in xs if ok)
        if kind in ("create_ct", "drop_cd", "rename", "create_schema"):
            if wins != 1:
                fail("%s %s: %d winners (want 1): %s" % (kind, name, wins, xs))
        elif kind in ("create_priv", "insert", "drop_dd"):
            if wins != len(xs):
                bad = [x for x in xs if not x[1]]
                fail("%s %s: unexpected failure: %s" % (kind, name, bad[:2]))
        elif kind == "insert_dd":
            for _, ok, err, _ in xs:
                if not ok and "unknown table" not in err and "no manifest" not in err:
                    fail("insert_dd %s: failed with unexpected shape: %s" % (name, err[:200]))

    # contended-name final placement
    for ct in ("ct1", "ct2"):
        if ct not in public:
            fail("contended create %s won but is not cataloged" % ct)
    for cd in ("cd1", "cd2"):
        if cd in public:
            fail("contended drop %s succeeded but table still cataloged" % cd)
    for r in ("r1", "r2"):
        targets = [t for t in (r + "a", r + "b") if t in public]
        if r in public or len(targets) != 1:
            fail("rename %s: src present=%s targets=%s" % (r, r in public, targets))
    if "sc_cont" not in schemas:
        fail("contended CREATE SCHEMA won but schema missing")

    # 2. catalog <-> manifest consistency
    cataloged_uuids = set()
    for sch, tables in cat["dbs"]["default"].items():
        for name, e in tables.items():
            cataloged_uuids.add(e["uuid"])
            if latest_manifest(os.path.join(data_dir, e["uuid"])) is None:
                fail("cataloged table %s.%s (uuid %s) has no readable manifest"
                     % (sch, name, e["uuid"]))
    for entry in os.listdir(data_dir):
        p = os.path.join(data_dir, entry)
        if entry.startswith("_") or not os.path.isdir(p):
            continue
        if os.path.isdir(os.path.join(p, "_log")):
            if entry not in cataloged_uuids and entry not in dropped:
                fail("orphaned table storage %s: neither cataloged nor in dropped ledger" % entry)

    # 3. zero lost DML on never-dropped tables
    con = duckdb.connect()
    for t in ("t_ins_a", "t_ins_b", "t_ins_sh"):
        expected = sorted([m["id"] for role in ("a", "b")
                           for i, e in recs[role].items()
                           for m in [o["%s_meta" % role][i]]
                           if m["kind"] == "insert" and m["table"] == t and e["ok"]]
                          + ([0] if t == "t_ins_sh" else []))
        mf = latest_manifest(os.path.join(data_dir, public[t]["uuid"]))
        files = [os.path.join(data_dir, public[t]["uuid"], f["path"]) for f in mf["files"]]
        actual = sorted(r[0] for r in con.execute(
            "SELECT id FROM read_parquet([%s])" % ", ".join("'%s'" % f for f in files)
        ).fetchall()) if files else []
        if actual != expected:
            fail("%s rows %s != successful inserts %s" % (t, actual[:20], expected[:20]))
    con.close()


def main():
    nseq, seed = int(sys.argv[1]), int(sys.argv[2])
    shared = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_catalog_fuzz_%d" % seed
    shutil.rmtree(shared, ignore_errors=True)
    os.makedirs(shared)
    rnd = random.Random(seed)
    seqs = [gen_sequence(rnd, i) for i in range(nseq)]
    seq_file = os.path.join(shared, "sequences.jsonl")
    with open(seq_file, "w") as f:
        for s in seqs:
            f.write(json.dumps(s) + "\n")

    runner = os.path.join(REPO, "scripts", "run.sh")
    procs = [subprocess.Popen([runner, "graft.tools.CatalogRaceRun", shared, role, seq_file],
                              stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
             for role in ("a", "b")]
    codes = [p.wait() for p in procs]
    print("writer exit codes: %s" % codes)

    logs = {}
    for role in ("a", "b"):
        with open(os.path.join(shared, "log_%s.jsonl" % role)) as f:
            logs[role] = [json.loads(l) for l in f if l.strip()]

    fails = []
    for o in seqs:
        check_sequence(o, shared, logs, fails)
    for msg in fails[:40]:
        print("FAIL " + msg)
    print("%d passed, %d failed" % (nseq - len({f.split(":")[0] for f in fails}),
                                    len({f.split(":")[0] for f in fails})))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
