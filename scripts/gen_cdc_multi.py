#!/usr/bin/env python3
"""Multi-origin CDC contention generator: one logical change history per
sequence (reusing gen_cdc_fuzz's model/chain machinery), with its batches
SHARDED ACROSS 2-3 ORIGINS feeding ONE table — per-origin monotone seq
numbers, interleaved arrival, plus REDELIVERIES of already-acknowledged
batches (same origin+seq+body) that the watermark check must skip.

graft.tools.CdcMultiRun POSTs each batch with its origin/seq params,
polls /sync/progress after every POST, and asserts:

  - per-origin durable AND memory watermarks are MONOTONE across polls,
    durable <= memory always;
  - a redelivered batch answers {"skipped":true} and changes nothing;
  - after the final flush every origin's durable == its max delivered
    seq;
  - the sync table's final state equals the direct-DML replay of the
    serial arrival-order history (the reference buffers per-origin
    watermarks concurrently — src/sync/writer.rs:27-129).

Origins are sequence-scoped names (watermarks are durable in the
catalog across sequences).

Usage: gen_cdc_multi.py <nseq> <seed> [norigins=3] > sequences.jsonl
"""
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_cdc_fuzz import Seq  # noqa: E402


def gen_sequence(rnd, i, norigins):
    s = Seq(rnd, i)
    nbatch = rnd.choice([1, 3, 64])
    origins = ["s%d_o%d" % (i, k) for k in range(norigins)]
    oseq = {o: 0 for o in origins}
    batches = []
    history = []
    for _ in range(rnd.randint(6, 12)):
        body = s.gen_batch(rnd.randint(2, 6))
        if not body:
            continue
        o = rnd.choice(origins)
        oseq[o] += 1
        b = {"origin": o, "seq": oseq[o], "body": body, "redelivery": False}
        batches.append(b)
        history.append(b)
        # redeliver an acknowledged batch (possibly the one just sent):
        # the per-origin watermark must skip it without state change
        if rnd.random() < 0.3:
            old = rnd.choice(history)
            batches.append({"origin": old["origin"], "seq": old["seq"],
                            "body": old["body"], "redelivery": True})
    return {"seq": i, "nbatch_mode": nbatch, "dml": s.dml, "batches": batches,
            "max_seq": {o: n for o, n in oseq.items() if n > 0}}


def main():
    n, seed = int(sys.argv[1]), int(sys.argv[2])
    norigins = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rnd = random.Random(seed)
    for i in range(n):
        print(json.dumps(gen_sequence(rnd, i, norigins)))


if __name__ == "__main__":
    main()
