#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf1000_r17.json from the round-16 artifact plus
the round-17 staged per-query gate reports.

Merge rule (provenance-honest):
 - rows verified GREEN in round 16 carry forward verbatim — the fixture
   is bit-deterministic (ScaleFixture from the same driver parquet) and
   none of those queries' builds changed between the r16 gate commit and
   HEAD (the only post-gate query-code change was the q_embed_* family:
   q_embed_neardup_auto, already the documented cutover row, and the new
   q_embed_keepers_auto, which gets a fresh r17 compare);
 - every r16 `pending_oracle` row is REPLACED by its r17 per-query
   report (tools/r17_gate.sh output) — still-missing reports stay
   pending_oracle;
 - the q_embed_neardup_auto cutover row is kept with its r16 detail;
 - q_embed_keepers_auto (new in the ledger) is added from its report.

usage: assemble_r17.py [reportDir] [r16Artifact] [out]
"""
import glob
import json
import os
import sys

rep_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r17_gate"
r16_path = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_sf1000_r16.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1000_r17.json"

r16 = json.load(open(r16_path))
queries = dict(r16["queries"])
carried = sum(1 for v in queries.values() if v.get("match"))

replaced, added = [], []
for path in sorted(glob.glob(os.path.join(rep_dir, "*.json"))):
    rep = json.load(open(path))
    for name, row in rep.get("queries", {}).items():
        if name in queries:
            replaced.append(name)
        else:
            added.append(name)
        queries[name] = row

still_pending = [n for n, v in queries.items()
                 if not v.get("match") and "pending_oracle" in v.get("detail", "")]
cutover = [n for n, v in queries.items()
           if not v.get("match") and "CUTOVER" in v.get("detail", "")]
mismatch = [n for n, v in queries.items()
            if not v.get("match") and n not in still_pending and n not in cutover]

ok = sum(1 for v in queries.values() if v.get("match"))
note = (
    "mult=1000 (~sf100: 5M docs / 2M vectors / 100M events) gate, round 17. "
    "Green rows from the r16 gate carry forward (bit-deterministic fixture, "
    "no query-code change for those entries since the r16 gate commit); every "
    "r16 pending_oracle row was re-dumped at HEAD (fresh /tmp/sf100x, "
    "SPARK_GRAFT_INITIAL_PARTITIONS=512, BROADCAST_THRESHOLD=512m, "
    "VERIFY_PARTS=8, periodic GC 60s) and compared by staged single-oracle "
    "check_correctness.py processes (GRAFT_DUCKDB_MEM=40GB, per-process spill "
    "dirs), --native DuckDB EXCEPT-ALL for q_tokenize, the validated stride-4 "
    "sub-block checker for q_minhash_lsh_auto, and the chunked DuckDB + "
    "union-find checker for q_embed_keepers_auto (new ledger entry this "
    "round: the keeper-direct scale-safe form of embedding near-dup). "
    "q_embed_neardup_auto remains the one documented Spark-side cutover "
    "(C(994,2)-per-clone-group pair output exceeds one host's scratch; full "
    "compare certified at mult=300; plan sizing pinned at mult=1000)."
)
out = {"ok": ok, "failed": len(queries) - ok, "note": note,
       "r16_carried_green": carried, "r17_replaced": sorted(set(replaced)),
       "r17_added": sorted(set(added)), "still_pending": sorted(still_pending),
       "mismatch": sorted(mismatch), "queries": queries}
json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
print(f"{out_path}: {ok}/{len(queries)} green; "
      f"replaced {len(set(replaced))}, added {sorted(set(added))}, "
      f"pending {sorted(still_pending)}, mismatch {sorted(mismatch)}, "
      f"cutover {sorted(cutover)}")
