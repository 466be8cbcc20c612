#!/bin/bash
# Round-18 eighth scale point: mult=3000 over sf0.1 (~sf300: 15M docs /
# 6M vectors / 300M events, ~8 GB parquet). VERDICT-r17 item 5.
#
# Budget-honest by construction: the DEFAULT query set is curated to
# what one host can oracle at this mult — the cheap certified spine
# (aggregates, joins, windows, hash/packing/quality) plus the
# scale-critical dedup/ANN family members that have LINEAR checkers
# (q_ewma streaming fold, q_minhash_lsh_auto stride sub-block,
# q_embed_keepers_auto chunked union-find). Everything not attempted
# gets an explicit pending_oracle row from the assembler — pending is
# not failed; provenance per row.
#
# usage: r18_sf3000.sh [fixture|dump|gate|all]
set -u
cd "$(dirname "$0")/.."
SF=${GRAFT_SF3000:-/tmp/sf300x}
OUT=${GRAFT_SF3000_OUT:-/tmp/verify_sf3000_out}
REP=${GRAFT_SF3000_REP:-/tmp/r18_gate3000}
STEP=${1:-all}
mkdir -p "$REP"

# Certified-cheap spine + linear-checker family. Order cheap-first so a
# mid-run host loss still leaves certifiable partial progress.
DUMPQ=${GRAFT_DUMP_QUERIES:-"q1_pricing,q_window_sum,q_semi_join,q_anti_join,q_hash_split,q_zorder3,q_sql_surface,q_token_packing,q_pii_redact,q_quality_calibrate,q_quality_drift,q_logreg_step,q_pq_rerank,q_pipeline_composite,q_dedup_exact,q_simhash,q_asof_join,q_ewma,q_minhash_lsh_auto,q_embed_keepers_auto"}

if [ "$STEP" = fixture ] || [ "$STEP" = all ]; then
  if [ ! -d "$SF/events.parquet" ]; then
    SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_DRIVER_MEM=32g \
      sbt -batch "runMain graft.ScaleFixture /root/testdata/sf0.1 $SF 3000" \
      || exit 2
  fi
fi

if [ "$STEP" = dump ] || [ "$STEP" = all ]; then
  GRAFT_DUMP_QUERIES="$DUMPQ" bash tools/r18_dump.sh "$SF" "$OUT" || exit 2
fi

if [ "$STEP" = gate ] || [ "$STEP" = all ]; then
  python3 tools/test_sweep_spills.py || exit 3
  . tools/sweep_spills.sh
  [ -s /tmp/oracle_sql_full.json ] || {
    echo "ERROR: /tmp/oracle_sql_full.json missing (copy from a full" \
      "Verify run's oracle_sql.json before gating)" >&2; exit 2; }

  for q in $(echo "$DUMPQ" | tr , ' '); do
    case $q in q_ewma|q_minhash_lsh_auto|q_embed_keepers_auto)
      continue;; esac  # linear-checker handlers below
    [ -s "$REP/$q.json" ] && { echo "== $q: report exists, skip"; continue; }
    cp /tmp/oracle_sql_full.json "$OUT/oracle_sql.json"
    echo "== $q start $(date +%T)"
    GRAFT_DUCKDB_MEM=${GRAFT_DUCKDB_MEM:-80GB} \
      timeout 14400 python3 tools/check_correctness.py "$SF" "$OUT" \
      --only "$q" --json "$REP/$q.json" > "$REP/$q.log" 2>&1
    echo "== $q done rc=$? $(date +%T)"
    sweep_spills
  done

  wrap() { # <query> <cmd...> — same contract as r18_gate.sh's wrap
    local q=$1; shift
    [ -s "$REP/$q.json" ] && { echo "== $q: report exists, skip"; return; }
    echo "== $q (checker: $1) start $(date +%T)"
    GRAFT_DUCKDB_MEM=${GRAFT_DUCKDB_MEM:-80GB} \
      timeout 14400 "$@" > "$REP/$q.log" 2>&1
    local rc=$?
    python3 - "$q" "$rc" "$REP/$q.log" "$REP/$q.json" "$2" "$SF" <<'EOF'
import json, sys
q, rc, log, out, checker, sf = sys.argv[1:7]
rc = int(rc)
tail = open(log, errors="replace").read()[-4000:]
ok = rc == 0 and "MATCH" in tail
detail = f"checker: {checker}" if ok else \
    f"checker {checker} rc={rc}; log tail: {tail[-300:]}"
json.dump({"sf_dir": sf, "ok": int(ok), "failed": int(not ok),
           "queries": {q: {"rows": -1 if not ok else 0, "match": ok,
                           "detail": detail}}},
          open(out, "w"), indent=1, sort_keys=True)
EOF
    echo "== $q done rc=$rc $(date +%T)"
    sweep_spills
  }
  wrap q_ewma python3 tools/check_ewma_scale.py "$SF" "$OUT"
  wrap q_minhash_lsh_auto python3 tools/check_minhash_subset.py "$SF" "$OUT" 4
  wrap q_embed_keepers_auto python3 tools/check_embed_keepers.py "$SF" "$OUT"
fi

echo "== r18 sf3000 $STEP complete $(date +%T)"
