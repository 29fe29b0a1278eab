#!/usr/bin/env python3
"""CDC crash-redelivery differential: kill the process in the historical
corruption window (flush committed, catalog watermark not yet advanced —
`post-sync-commit` in SyncBuffer.flushKey) and prove full-stream
redelivery is safe.

One seeded change-batch stream (gen_cdc_fuzz's model: inserts, updates
with changed=false GARBAGE sentinels, deletes, PK moves, intra-batch
chains) feeds ONE table through graft.tools.CrashSyncRun, flush per
batch. Each cycle the child redelivers the WHOLE stream from seq 1 —
source-replay semantics — and the parent plants a kill at the sampled
n-th applied flush. After every kill, from disk alone:

  1. applied prefix A = the table manifest's syncSeq[origin] (the
     watermark written ATOMICALLY with the applying commit — the fix
     under test; seqs are 1..N dense so A IS the prefix length);
  2. table state (DuckDB over the manifest's files) == DuckDB replay of
     exactly batches 1..A's DML. Pre-fix, the killed flush's catalog
     advance was lost, the redelivery re-applied batch A, and re-applied
     moves/inserts corrupted (duplicate PKs, materialized sentinels);
  3. the catalog watermark never LEADS the manifest's (lag is the safe
     direction), and the child's own outcome log shows batches <= A
     Skipped, batches > A flushed.

Usage: sync_crash_fuzz.py <seed> <cycles> [workdir]
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
sys.path.insert(0, os.path.join(REPO, "scripts"))
from gen_cdc_fuzz import Seq  # noqa: E402

TABLE = "cdc_sync"
ORIGIN = "crash_origin"


def gen_stream(seed, nbatches):
    rnd = random.Random(seed)
    s = Seq(rnd, 0)
    batches = []
    for i in range(nbatches):
        dml_before = len(s.dml)
        body = s.gen_batch(rnd.randint(2, 6))
        batches.append({"seq": i + 1, "body": body,
                        "dml": s.dml[dml_before:]})
    return batches


def load_manifest_state(data_dir):
    catdir = os.path.join(data_dir, "_catalog")
    vs = sorted(f for f in os.listdir(catdir) if re.match(r"v\d+\.json$", f))
    with open(os.path.join(catdir, vs[-1])) as f:
        cat = json.load(f)
    uuid = cat["dbs"]["default"]["public"][TABLE]["uuid"]
    root = os.path.join(data_dir, uuid)
    logdir = os.path.join(root, "_log")
    mvs = sorted(int(m.group(1)) for f in os.listdir(logdir)
                 if (m := re.match(r"v(\d+)\.json$", f)))
    assert mvs == list(range(mvs[0], mvs[-1] + 1)), "version log not dense: %s" % mvs
    with open(os.path.join(logdir, "v%020d.json" % mvs[-1])) as f:
        manifest = json.load(f)
    catalog_wm = cat.get("syncSeq", {}).get(ORIGIN, -1)
    return root, manifest, catalog_wm


def verify(label, data_dir, batches):
    root, manifest, catalog_wm = load_manifest_state(data_dir)
    applied = int(manifest.get("syncSeq", {}).get(ORIGIN, 0))
    assert catalog_wm <= applied, (
        "%s: catalog watermark %d LEADS the manifest's %d" % (label, catalog_wm, applied))
    files = [os.path.join(root, e["path"]) for e in manifest["files"]]
    for p in files:
        assert os.path.exists(p), "%s: missing file %s" % (label, p)
    con = duckdb.connect()
    con.execute("CREATE TABLE cdc_dml (id BIGINT, a BIGINT, b BIGINT, s VARCHAR)")
    for b in batches[:applied]:
        for stmt in b["dml"]:
            con.execute(stmt)
    expected = con.execute("SELECT id, a, b, s FROM cdc_dml ORDER BY 1,2,3,4").fetchall()
    actual = con.execute(
        "SELECT id, a, b, s FROM read_parquet([%s]) ORDER BY 1,2,3,4"
        % ", ".join("'%s'" % p for p in files)).fetchall() if files else []
    con.close()
    assert actual == expected, (
        "%s: state mismatch at applied prefix %d: %d actual vs %d expected; "
        "diffs %s | %s" % (label, applied, len(actual), len(expected),
                           [r for r in actual if r not in expected][:3],
                           [r for r in expected if r not in actual][:3]))
    return applied


def run_child(data_dir, batches_file, crash_at=None):
    env = dict(os.environ)
    env.pop("GRAFT_CRASH_AT", None)
    if crash_at:
        env["GRAFT_CRASH_AT"] = crash_at
    r = subprocess.run(
        [os.path.join(REPO, "scripts", "run.sh"),
         "graft.tools.CrashSyncRun", data_dir, batches_file],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode in (0, 137), (
        "child exited %d\nstdout: %s\nstderr: %s" % (
            r.returncode, r.stdout[-1500:], r.stderr[-1500:]))
    return r.returncode, r.stdout


def main():
    seed = int(sys.argv[1])
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    workdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_sync_crash_%d" % seed
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    data_dir = os.path.join(workdir, "data")
    batches = gen_stream(seed, nbatches=80)
    batches_file = os.path.join(workdir, "batches.json")
    with open(batches_file, "w") as f:
        json.dump({"table": TABLE, "origin": ORIGIN, "batches": batches}, f)

    rnd = random.Random(seed * 17 + 3)
    kills = 0
    applied = 0
    cycle = 0
    while cycle < cycles and applied < len(batches):
        cycle += 1
        remaining = len(batches) - applied
        k = rnd.randint(1, min(3, remaining))
        code, out = run_child(data_dir, batches_file, "post-sync-commit:%d" % k)
        if code == 137:
            kills += 1
        new_applied = verify("cycle %d (kill at +%d)" % (cycle, k), data_dir, batches)
        # redelivered prefix must have been SKIPPED, not re-applied: the
        # child's outcome log shows per-seq outcomes
        outcomes = [json.loads(l) for l in out.splitlines()
                    if l.startswith('{"seq"')]
        for oc in outcomes:
            if oc["seq"] <= applied:
                assert oc["outcome"].startswith("Skipped"), (
                    "cycle %d: already-applied seq %d was %s, not Skipped"
                    % (cycle, oc["seq"], oc["outcome"]))
        assert new_applied >= applied, "watermark regressed"
        applied = new_applied

    # final full delivery must complete and match end-state
    code, _ = run_child(data_dir, batches_file)
    assert code == 0
    applied = verify("final", data_dir, batches)
    assert applied == len(batches), "final: only %d/%d applied" % (applied, len(batches))
    print(json.dumps({"seed": seed, "cycles": cycle, "kills": kills,
                      "batches": len(batches), "ok": True}))


if __name__ == "__main__":
    main()
