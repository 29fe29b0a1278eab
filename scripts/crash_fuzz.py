#!/usr/bin/env python3
"""Crash-fault-injection differential for the commit ladder.

Drives graft.tools.CrashDmlRun (a child JVM running a seeded DML
sequence) with a kill point planted via GRAFT_CRASH_AT at one of the
three ladder boundaries (graft.lake.Faults):

  pre-manifest   data parquet written, manifest not published
  post-manifest  manifest published, latest-hint not written
  vacuum-sweep   mid-deletion sweep of a VACUUM

After EVERY kill the parent verifies, from the on-disk state alone:

  1. the manifest log is a dense version range and every file the
     latest manifest references exists (the table "reads at exactly the
     last committed version");
  2. the table's actual rows (DuckDB over the manifest's parquet files)
     equal a DuckDB replay of exactly the committed statement prefix
     (prefix length = latestVersion - setupVersion: one commit per
     statement — a killed pre-manifest statement is NOT in the state, a
     killed post-manifest one IS);
  3. the latest hint never leads the log (it may lag after a
     post-manifest kill; readers probe past it — proven by the resumed
     child, which must pick resume = latestVersion - setupVersion).

The resumed writer continuing cleanly IS the next cycle. Interleaved
vacuum-kill cycles plant vacuum-sweep kills, assert retained versions
stay readable, and re-run VACUUM to completion; the campaign ends with
a full VACUUM and an orphan sweep assertion: every *.parquet under the
table root is referenced by the latest manifest.

Usage: crash_fuzz.py <seed> <cycles> [workdir]
Exit 0 = all cycles verified; prints one JSON summary line.
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
TABLE = "t_crash"


def gen_statements(rnd, n):
    """Deterministic literal-only DML over t_crash(id,grp,val,s); every
    statement commits exactly one manifest version."""
    stmts = []
    next_id = 1000
    for _ in range(n):
        op = rnd.choices(["insert", "update", "update_expr", "delete_mod",
                          "delete_range"], weights=[40, 20, 15, 15, 10])[0]
        if op == "insert":
            rows = []
            for _ in range(rnd.randint(1, 3)):
                sval = "NULL" if rnd.random() < 0.1 else "'s%d'" % rnd.randint(0, 99)
                rows.append("(%d, %d, %d, %s)" % (
                    next_id, rnd.randint(0, 9), rnd.randint(-100, 100), sval))
                next_id += 1
            stmts.append("INSERT INTO %s VALUES %s" % (TABLE, ", ".join(rows)))
        elif op == "update":
            stmts.append("UPDATE %s SET val = %d, s = 'u%d' WHERE grp = %d" % (
                TABLE, rnd.randint(-100, 100), rnd.randint(0, 99), rnd.randint(0, 9)))
        elif op == "update_expr":
            stmts.append("UPDATE %s SET val = val + %d WHERE id %% 5 = %d" % (
                TABLE, rnd.randint(1, 9), rnd.randint(0, 4)))
        elif op == "delete_mod":
            stmts.append("DELETE FROM %s WHERE id %% 13 = %d" % (TABLE, rnd.randint(0, 12)))
        else:
            a = rnd.randint(1000, next_id + 50)
            stmts.append("DELETE FROM %s WHERE id BETWEEN %d AND %d" % (TABLE, a, a + rnd.randint(0, 30)))
    return stmts


def setup_statements(rnd):
    rows = ", ".join("(%d, %d, %d, 's%d')" % (i, i % 10, rnd.randint(-50, 50), i % 7)
                     for i in range(40))
    return [
        "CREATE TABLE %s (id BIGINT, grp BIGINT, val BIGINT, s VARCHAR)" % TABLE,
        "INSERT INTO %s VALUES %s" % (TABLE, rows),
    ]


class Campaign:
    def __init__(self, workdir, seed):
        self.dir = workdir
        self.data = os.path.join(workdir, "data")
        os.makedirs(self.data, exist_ok=True)
        rnd = random.Random(seed)
        self.setup = setup_statements(rnd)
        self.dml = gen_statements(rnd, 240)
        self.setup_version = len(self.setup) - 1  # CREATE commits v0, each INSERT +1
        self.stmts_file = os.path.join(workdir, "stmts.json")
        with open(self.stmts_file, "w") as f:
            json.dump({"table": TABLE, "setup": self.setup, "dml": self.dml,
                       "setup_version": self.setup_version, "retain": 1}, f)

    # --- on-disk state readers (no JVM involved) --------------------------

    def table_root(self):
        catdir = os.path.join(self.data, "_catalog")
        vs = sorted(f for f in os.listdir(catdir) if re.match(r"v\d+\.json$", f))
        with open(os.path.join(catdir, vs[-1])) as f:
            cat = json.load(f)
        uuid = cat["dbs"]["default"]["public"][TABLE]["uuid"]
        return os.path.join(self.data, uuid)

    def log_versions(self, root):
        logdir = os.path.join(root, "_log")
        return sorted(int(m.group(1)) for f in os.listdir(logdir)
                      if (m := re.match(r"v(\d+)\.json$", f)))

    def manifest(self, root, v):
        with open(os.path.join(root, "_log", "v%020d.json" % v)) as f:
            return json.load(f)

    def hint(self, root):
        p = os.path.join(root, "_log", "_latest.hint")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    # --- the differential verify ------------------------------------------

    def verify(self, label):
        root = self.table_root()
        vs = self.log_versions(root)
        assert vs, "%s: empty manifest log" % label
        assert vs == list(range(vs[0], vs[-1] + 1)), \
            "%s: version log not dense: %s" % (label, vs)
        latest = vs[-1]
        h = self.hint(root)
        assert h is None or h <= latest, \
            "%s: hint %s leads the log (latest %d)" % (label, h, latest)
        m = self.manifest(root, latest)
        files = [os.path.join(root, e["path"]) for e in m["files"]]
        for p in files:
            assert os.path.exists(p), "%s: manifest v%d references missing file %s" % (label, latest, p)

        committed = latest - self.setup_version
        assert 0 <= committed <= len(self.dml), \
            "%s: committed prefix %d out of range" % (label, committed)
        con = duckdb.connect()
        for s in self.setup + self.dml[:committed]:
            con.execute(s)
        expected = con.execute(
            "SELECT id, grp, val, s FROM %s ORDER BY 1,2,3,4" % TABLE).fetchall()
        if files:
            actual = con.execute(
                "SELECT id, grp, val, s FROM read_parquet([%s]) ORDER BY 1,2,3,4"
                % ", ".join("'%s'" % p for p in files)).fetchall()
        else:
            actual = []
        con.close()
        assert actual == expected, (
            "%s: state mismatch at v%d (prefix %d): %d actual vs %d expected rows; "
            "first diffs: %s | %s" % (
                label, latest, committed, len(actual), len(expected),
                [r for r in actual if r not in expected][:3],
                [r for r in expected if r not in actual][:3]))
        return latest, committed

    def orphan_check(self, label):
        root = self.table_root()
        vs = self.log_versions(root)
        referenced = set()
        for v in vs:
            referenced.update(e["path"] for e in self.manifest(root, v)["files"])
        on_disk = set()
        for base, _, names in os.walk(root):
            for n in names:
                if n.endswith(".parquet"):
                    on_disk.add(os.path.relpath(os.path.join(base, n), root))
        orphans = on_disk - referenced
        assert not orphans, "%s: %d orphan parquet files survived VACUUM: %s" % (
            label, len(orphans), sorted(orphans)[:5])

    # --- child launches -----------------------------------------------------

    def run_child(self, mode, crash_at=None, timeout=240):
        env = dict(os.environ)
        env.pop("GRAFT_CRASH_AT", None)
        if crash_at:
            env["GRAFT_CRASH_AT"] = crash_at
        r = subprocess.run(
            [os.path.join(REPO, "scripts", "run.sh"),
             "graft.tools.CrashDmlRun", self.data, self.stmts_file, mode],
            env=env, capture_output=True, text=True, timeout=timeout)
        assert r.returncode in (0, 137), (
            "child exited %d (crash_at=%s, mode=%s)\nstdout: %s\nstderr: %s" % (
                r.returncode, crash_at, mode, r.stdout[-2000:], r.stderr[-2000:]))
        return r.returncode, r.stdout


def main():
    seed = int(sys.argv[1])
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    workdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_crash_fuzz_%d" % seed
    shutil.rmtree(workdir, ignore_errors=True)
    c = Campaign(workdir, seed)
    rnd = random.Random(seed * 31 + 7)

    kills = {"pre-manifest": 0, "post-manifest": 0, "vacuum-sweep": 0}
    completions = 0
    cycle = 0
    prev_latest = None
    while cycle < cycles:
        cycle += 1
        if cycle % 8 == 0:
            # vacuum-kill cycle: plant a mid-sweep halt, verify retained
            # version unharmed, then complete the sweep
            code, _ = c.run_child("vacuum", "vacuum-sweep:%d" % rnd.randint(1, 4))
            if code == 137:
                kills["vacuum-sweep"] += 1
            latest, committed = c.verify("cycle %d (vacuum-kill)" % cycle)
            code2, _ = c.run_child("vacuum")
            assert code2 == 0
            c.verify("cycle %d (vacuum-resume)" % cycle)
            c.orphan_check("cycle %d" % cycle)
            prev_latest = latest
            continue
        point = rnd.choice(["pre-manifest", "post-manifest"])
        k = rnd.randint(1, 3)
        code, out = c.run_child("dml", "%s:%d" % (point, k))
        if code == 137:
            kills[point] += 1
        else:
            completions += 1
        latest, committed = c.verify("cycle %d (%s:%d)" % (cycle, point, k))
        # the resumed child must pick up exactly at the committed prefix
        first = json.loads(out.splitlines()[0]) if out.strip() else {}
        if prev_latest is not None and "resume" in first:
            assert first["resume"] == prev_latest - c.setup_version, (
                "cycle %d: child resumed at %s, expected %d" % (
                    cycle, first["resume"], prev_latest - c.setup_version))
        prev_latest = latest
        if committed >= len(c.dml):
            break

    # drain any remaining statements, then the final sweep must leave
    # zero orphans from every pre-manifest kill along the way
    code, _ = c.run_child("dml", timeout=600)
    assert code == 0
    latest, committed = c.verify("final")
    assert committed == len(c.dml), "final: only %d/%d committed" % (committed, len(c.dml))
    code, _ = c.run_child("vacuum")
    assert code == 0
    c.verify("final-vacuum")
    c.orphan_check("final")

    print(json.dumps({"seed": seed, "cycles": cycle, "kills": kills,
                      "completions": completions, "statements": len(c.dml),
                      "final_version": latest, "ok": True}))


if __name__ == "__main__":
    main()
