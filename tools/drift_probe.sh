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
# Both commits are measured BACK-TO-BACK IN THE SAME CONTEXT (fresh JVM,
# focused min-of-5): a radar figure comes from a long full-suite run
# whose memory/JIT context inflates sub-second queries, so comparing
# probe(old, focused) against radar(HEAD, full-suite) manufactures
# phantom regressions — the first probe run read q_sessions 0.359 s on
# the old commit vs 0.469 s on the SAME code in the radar. The paired
# measurement makes the drift/regression call relative, not contextual.
#
# Usage: tools/drift_probe.sh <query>[,<query>...] [commit]
#   commit defaults to the previous round's end-of-round snapshot.
set -euo pipefail
cd "$(dirname "$0")/.."
Q=${1:?usage: tools/drift_probe.sh <query>[,<query>...] [commit]}
# Resolve the default against HEAD~1: right after a snapshot commit the
# most recent snapshot IS HEAD, and a probe that builds the same code on
# both sides measures nothing (the regression check would be vacuous).
COMMIT=${2:-$(git log --grep='end-of-round snapshot' -1 --format=%h HEAD~1)}
[ -n "$COMMIT" ] || { echo "no prior-round snapshot commit found; pass one"; exit 1; }
if [ "$(git rev-parse "$COMMIT")" = "$(git rev-parse HEAD)" ]; then
  echo "refusing to probe: old commit $COMMIT is the current HEAD — the" \
       "paired comparison would measure identical code on both sides." >&2
  exit 1
fi
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
WT=/tmp/drift_probe_wt
REPO=$(pwd)

git worktree remove --force "$WT" 2>/dev/null || true
git worktree add --detach "$WT" "$COMMIT" >/dev/null
trap 'git worktree remove --force "$WT" 2>/dev/null || true' EXIT

# The probe calibration must be the REPO's (load ratios comparable across
# the two builds); copy so the old Bench's self-heal writes don't touch it.
cp bench_probe_cal.txt "$WT/" 2>/dev/null || true

focused() { # focused quiet min-of-5 pass in directory $1
  (cd "$1" && SPARK_GRAFT_BENCH_ONLY="$Q" SPARK_GRAFT_BENCH_REPS=5 \
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    SPARK_GRAFT_BENCH_BASELINE=/nonexistent-baseline.json \
    SPARK_GRAFT_RADAR_OUT=/tmp/drift_probe_radar.json \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '^{' | head -1)
}

echo "== drift probe: building $COMMIT in $WT =="
(cd "$WT" && sbt -batch compile >/dev/null)
echo "== focused quiet pass: $Q at $SF on $COMMIT =="
OLD_LINE=$(focused "$WT")
echo "$OLD_LINE"
HEAD_COMMIT=$(git rev-parse --short HEAD)
echo "== same pass on HEAD ($HEAD_COMMIT) =="
HEAD_LINE=$(focused "$REPO")
echo "$HEAD_LINE"

python3 - "$Q" "$COMMIT" "$HEAD_COMMIT" "$REPO/bench_drift_probe.json" \
  "$OLD_LINE" <<'EOF' "$HEAD_LINE"
import json, sys, datetime
qs, commit, head_commit, out_path = sys.argv[1:5]
old = json.loads(sys.argv[5])
head = json.loads(sys.argv[6])
try:
    probe = json.load(open(out_path))
except Exception:
    probe = {}
for q in qs.split(','):
    q = q.strip()
    for r in (old, head):
        if q not in r.get("queries", {}):
            sys.exit(f"query {q} missing from probe bench output")
    probe[q] = {"commit": commit,
                "min_sec": old["queries"][q],
                "load": old["load"][q],
                "head_commit": head_commit,
                "head_min_sec": head["queries"][q],
                "head_load": head["load"][q],
                "date": str(datetime.date.today())}
json.dump(probe, open(out_path, "w"), indent=1, sort_keys=True)
for q in qs.split(','):
    r = probe[q.strip()]
    print(f"{q}: old {r['min_sec']}s (load {r['load']}) vs "
          f"HEAD {r['head_min_sec']}s (load {r['head_load']})")
EOF
