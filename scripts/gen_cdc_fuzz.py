#!/usr/bin/env python3
"""CDC-vs-DML differential generator: each sequence is ONE logical
history of row-level changes (insert / update-with-changed-flags /
delete / pk-move, including intra-window chains) expressed TWO ways:

  - `dml`:     direct SQL statements (INSERT/UPDATE/DELETE on cdc_dml)
  - `batches`: JSON-lines change batches for POST /sync/... on cdc_sync

graft.tools.CdcFuzzRun executes both against one context and asserts
the final table states are identical — the /sync path (SyncBuffer chain
squash → SyncMerge resolution) and the direct DML path implement the
same upsert semantics but were previously fuzzed separately. Reference
anchor: the sync planner's golden tests (src/sync/planner.rs).

What makes the differential sharp:
  - unchanged columns in update rows carry a GARBAGE sentinel with
    changed_<col>=false — a flag-ignoring implementation materializes
    the sentinel and diverges loudly;
  - chains (insert→update, insert→delete, A→B→C moves, delete→reinsert)
    are emitted freely, both within one batch and across batches — the
    buffer's physical squash must collapse them without losing writes;
  - `nbatch_mode` picks the frontend flush cadence (1 = merge per POST,
    3 / 64 = buffered windows), so chains land both inside one squash
    window and across committed version boundaries.

Model discipline: the generator tracks the table state (pk -> row) so
update/move rows can carry exact full-row images where the semantics
require them; all values are literals (no expressions), keeping the DML
side trivially deterministic.

Usage: gen_cdc_fuzz.py <nseq> <seed> > sequences.jsonl
Each line: {"seq": i, "nbatch_mode": m, "dml": [...], "batches": [...]}
(each batches[] element is one POST body: '\n'-joined JSON rows)
"""
import json
import random
import sys

STRPOOL = ["alpha", "beta", "gamma", "delta", "x", "yz", "longish_value", ""]
GARBAGE_I = 987654321
GARBAGE_S = "GARBAGE_SENTINEL"


def sql_lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'%s'" % v.replace("'", "''")
    return str(v)


class Seq:
    def __init__(self, rnd, seq):
        self.rnd = rnd
        self.seq = seq
        self.model = {}          # pk -> {"a":..,"b":..,"s":..}
        self.next_pk = 1
        self.seqno = 0
        self.dml = []
        self.batches = []

    def lit_i(self):
        return None if self.rnd.random() < 0.10 else self.rnd.randint(-50, 999)

    def lit_s(self):
        return None if self.rnd.random() < 0.10 else self.rnd.choice(STRPOOL)

    def fresh_pk(self):
        pk = self.next_pk
        self.next_pk += 1
        return pk

    def row_json(self, old_pk, new_pk, vals, changed=None):
        self.seqno += 1
        o = {"old_id": old_pk, "new_id": new_pk,
             "a": vals.get("a"), "b": vals.get("b"), "s": vals.get("s"),
             "_seq": self.seqno}
        if changed is not None:
            for c, fl in changed.items():
                o["changed_%s" % c] = fl
        return json.dumps(o)

    def gen_batch(self, nops, touched_resets=True):
        """One POST body of nops change rows; returns the JSON-lines str.
        `touched` tracks pks already touched in THIS batch: their later
        updates carry full images (changed=true everywhere) because a
        changed=false resolution against the base would skip the
        intra-batch write; first touches of based rows use the garbage
        sentinel to prove flags are honored."""
        lines = []
        touched = set()
        for _ in range(nops):
            live = sorted(self.model.keys())
            op = self.rnd.choices(
                ["insert", "update", "delete", "move"],
                weights=[30 if len(live) < 40 else 10,
                         40 if live else 0,
                         15 if live else 0,
                         15 if live else 0])[0]
            if op == "insert":
                pk = self.fresh_pk()
                vals = {"a": self.lit_i(), "b": self.lit_i(), "s": self.lit_s()}
                self.model[pk] = dict(vals)
                self.dml.append(
                    "INSERT INTO cdc_dml (id, a, b, s) VALUES (%d, %s, %s, %s)"
                    % (pk, sql_lit(vals["a"]), sql_lit(vals["b"]), sql_lit(vals["s"])))
                lines.append(self.row_json(None, pk, vals))
                touched.add(pk)
            elif op == "update":
                pk = self.rnd.choice(live)
                cols = self.rnd.sample(["a", "b", "s"], self.rnd.randint(1, 3))
                newv = {c: (self.lit_s() if c == "s" else self.lit_i()) for c in cols}
                self.model[pk].update(newv)
                self.dml.append("UPDATE cdc_dml SET %s WHERE id = %d" % (
                    ", ".join("%s = %s" % (c, sql_lit(v)) for c, v in newv.items()), pk))
                if pk in touched:
                    # intra-batch chain: full image, all changed
                    vals = dict(self.model[pk])
                    changed = {c: True for c in ("a", "b", "s")}
                else:
                    vals = {c: (GARBAGE_S if c == "s" else GARBAGE_I)
                            for c in ("a", "b", "s")}
                    vals.update(newv)
                    changed = {c: (c in newv) for c in ("a", "b", "s")}
                lines.append(self.row_json(pk, pk, vals, changed))
                touched.add(pk)
            elif op == "delete":
                pk = self.rnd.choice(live)
                del self.model[pk]
                self.dml.append("DELETE FROM cdc_dml WHERE id = %d" % pk)
                lines.append(self.row_json(pk, None, {}))
                touched.add(pk)
            else:  # pk move, optionally with value changes
                old = self.rnd.choice(live)
                new = self.fresh_pk()
                row = self.model.pop(old)
                if self.rnd.random() < 0.5:
                    row["a"] = self.lit_i()
                self.model[new] = row
                self.dml.append(
                    "UPDATE cdc_dml SET id = %d, a = %s WHERE id = %d"
                    % (new, sql_lit(row["a"]), old))
                # moves carry the full image (the resolution target row
                # changes identity; flags-vs-base still resolve by OLD pk,
                # but a full image keeps intra-batch A->B->C chains exact)
                lines.append(self.row_json(old, new, dict(row),
                                           {c: True for c in ("a", "b", "s")}))
                touched.add(new)
                touched.add(old)
        return "\n".join(lines)


def gen_sequence(rnd, i):
    s = Seq(rnd, i)
    nbatch = rnd.choice([1, 3, 64])
    for _ in range(rnd.randint(4, 9)):
        s.batches.append(s.gen_batch(rnd.randint(2, 8)))
    return {"seq": i, "nbatch_mode": nbatch, "dml": s.dml, "batches": s.batches,
            "final_rows": len(s.model)}


def main():
    n, seed = int(sys.argv[1]), int(sys.argv[2])
    rnd = random.Random(seed)
    for i in range(n):
        print(json.dumps(gen_sequence(rnd, i)))


if __name__ == "__main__":
    main()
