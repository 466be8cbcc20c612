#!/usr/bin/env python3
"""Summarize the r18 paired RocksDB-dial A/B (tools/r18_rocksdb_ab.sh):
per (population, config) min-of-3 band_state docs/s, the paired verdict,
and an out-parity check across every run.

usage: r18_rocksdb_ab_summarize.py [/tmp/r18_rocksdb_ab.jsonl]
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r18_rocksdb_ab.jsonl"
cells = defaultdict(list)   # (n, config) -> [docs_per_sec]
outs = defaultdict(set)     # n -> {out counts}
for line in open(path):
    line = line.strip()
    if not line:
        continue
    r = json.loads(line)
    st = r["band_state"]
    cells[(r["n"], r["config"])].append(float(st["docs_per_sec"]))
    outs[r["n"]].add(st["out"])

bad_parity = {n: sorted(o) for n, o in outs.items() if len(o) != 1}
if bad_parity:
    print(f"OUT-PARITY VIOLATION: {bad_parity}")
    sys.exit(1)

print(f"{'n':>9} {'config':>9} {'min-of-3':>10} {'all reps':>30} {'out':>10}")
verdicts = {}
for n in sorted({k[0] for k in cells}):
    best = {}
    for cfg in ("defaults", "dials"):
        reps = cells.get((n, cfg), [])
        best[cfg] = max(reps) if reps else float("nan")
        print(f"{n:>9} {cfg:>9} {best[cfg]:>10.0f} "
              f"{str([round(x) for x in sorted(reps)]):>30} "
              f"{next(iter(outs[n])):>10}")
    ratio = best["dials"] / best["defaults"]
    verdicts[n] = ratio
    print(f"{n:>9} dials/defaults (min-of-3 best): {ratio:.3f}")
print()
for n, r in verdicts.items():
    word = "help" if r > 1.10 else ("hurt" if r < 0.90 else "flat")
    print(f"verdict @ {n} docs: dials {word} ({r:.3f}x; "
          f"|delta| under 10% reads as flat on this host)")
