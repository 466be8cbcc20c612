#!/bin/bash
# Drift-vs-regression probe for the bench baseline restamp rule.
#
# A bench_quiet_baseline.json row that reads >=1.5x for K consecutive
# quiet rounds is EITHER host drift (the machine got slower — restamp
# the row) or a code regression that arrived within the window (fix the
# code — the restamp would bury it). The two are indistinguishable from
# timings on HEAD alone; the discriminating experiment (what the r14
# judge did by hand for q1_pricing) is to rebuild a PRIOR commit on the
# same host and re-measure the same query quiet:
#   old commit ALSO slow  -> the host moved        -> drift, restamp ok
#   old commit still fast -> the slowdown shipped   -> regression, refuse
#
# This script runs that experiment and records the verdict row in
# bench_drift_probe.json, which graft.Bench requires before any restamp.
#
# Usage: tools/drift_probe.sh <query>[,<query>...] [commit]
#   commit defaults to the previous round's end-of-round snapshot.
set -euo pipefail
cd "$(dirname "$0")/.."
Q=${1:?usage: tools/drift_probe.sh <query>[,<query>...] [commit]}
COMMIT=${2:-$(git log --grep='end-of-round snapshot' -1 --format=%h)}
[ -n "$COMMIT" ] || { echo "no prior-round snapshot commit found; pass one"; exit 1; }
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
WT=/tmp/drift_probe_wt
REPO=$(pwd)

git worktree remove --force "$WT" 2>/dev/null || true
git worktree add --detach "$WT" "$COMMIT" >/dev/null
trap 'git worktree remove --force "$WT" 2>/dev/null || true' EXIT

# The probe calibration must be the REPO's (load ratios comparable across
# the two builds); copy so the old Bench's self-heal writes don't touch it.
cp bench_probe_cal.txt "$WT/" 2>/dev/null || true

echo "== drift probe: building $COMMIT in $WT =="
(cd "$WT" && sbt -batch compile >/dev/null)
echo "== focused quiet pass: $Q at $SF on $COMMIT =="
LINE=$(cd "$WT" && SPARK_GRAFT_BENCH_ONLY="$Q" SPARK_GRAFT_BENCH_REPS=5 \
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_BENCH_BASELINE=/nonexistent-baseline.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '^{' | head -1)
echo "$LINE"

python3 - "$Q" "$COMMIT" "$REPO/bench_drift_probe.json" <<'EOF' "$LINE"
import json, sys, datetime
qs, commit, out_path, line = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
radar = json.loads(line)
try:
    probe = json.load(open(out_path))
except Exception:
    probe = {}
for q in qs.split(','):
    q = q.strip()
    if q not in radar.get("queries", {}):
        sys.exit(f"query {q} missing from probe bench output")
    probe[q] = {"commit": commit,
                "min_sec": radar["queries"][q],
                "load": radar["load"][q],
                "date": str(datetime.date.today())}
json.dump(probe, open(out_path, "w"), indent=1, sort_keys=True)
print(f"wrote {out_path}: " +
      ", ".join(f"{q}={probe[q.strip()]['min_sec']}s load={probe[q.strip()]['load']}"
                for q in qs.split(',')))
EOF
