#!/bin/bash
# Round-17 staged oracle gate for the mult=1000 pending compares.
# One check_correctness.py process per query (DuckDB segfault isolation),
# light oracles first, per-query JSON reports merged later by
# tools/assemble_r17.py. Restores the full oracle_sql.json before every
# invocation (a finished Verify run rewrites it filtered to its subset).
set -u
cd "$(dirname "$0")/.."
SF=/tmp/sf100x
OUT=/tmp/verify_sf1000_out
REP=/tmp/r17_gate
mkdir -p "$REP"

LIGHT="q_logreg_step q_quality_drift q_sql_surface q_pq_rerank q_zorder3 q_quality_calibrate q_hash_split q_ann_ivf q_kmeans_step q_pipeline_composite q_window_sum q_semi_join q_pii_redact q_token_packing"
MED="q_ewma q_minhash_lsh q_neardup_components q_corpus_delta q_semdedup q_dedup_keepers q_media_audiohash q_media_phash q_media_meta q_repetition q_unigram_nll q_edit_distance q_dup_spans q_ngram_jaccard q_corpus_build"
# GRAFT_GATE_QUERIES overrides the list — lets the harness run two gate
# processes over disjoint halves (per-process spill dirs + per-query
# reports make that safe; keep the BIG oracles serial on one side).
QUERIES=${GRAFT_GATE_QUERIES:-"$LIGHT $MED"}

# Remove only spill dirs whose owning checker is DEAD. The first r17 run
# used a bare `rm -rf /tmp/duckdb-gate-spill-*` here, and with two gate
# halves running concurrently each completed query in one half wiped the
# OTHER half's LIVE spill dir — DuckDB aborts (rc=134/139) the moment it
# next touches its temp storage. Six queries died that way before the
# pattern was spotted (the dir name ends in the checker's PID, so
# liveness is checkable).
sweep_spills() {
  for d in /tmp/duckdb-*spill-*; do
    [ -e "$d" ] || continue
    local pid=${d##*-}
    case $pid in *[!0-9]*) continue;; esac
    kill -0 "$pid" 2>/dev/null || rm -rf "$d"
  done
}

for q in $QUERIES; do
  case $q in q_tokenize|q_minhash_lsh_auto|q_embed_keepers_auto)
    continue;; esac   # dedicated handlers below
  [ -s "$REP/$q.json" ] && { echo "== $q: report exists, skip"; continue; }
  cp /tmp/oracle_sql_full.json "$OUT/oracle_sql.json"
  echo "== $q start $(date +%T)"
  GRAFT_DUCKDB_MEM=${GRAFT_DUCKDB_MEM:-40GB} \
    timeout 14400 python3 tools/check_correctness.py "$SF" "$OUT" \
    --only "$q" --json "$REP/$q.json" > "$REP/$q.log" 2>&1
  rc=$?
  echo "== $q done rc=$rc $(date +%T)"
  sweep_spills
done

# q_tokenize: 271M-row result — DuckDB-native EXCEPT-ALL compare.
# (Runs only in the default/full invocation, or when explicitly listed.)
q=q_tokenize
if [ -z "${GRAFT_GATE_QUERIES:-}" ] || [[ " $QUERIES " == *" $q "* ]]; then :; else q=__skip__; fi
if [ "$q" != "__skip__" ] && [ ! -s "$REP/$q.json" ]; then
  cp /tmp/oracle_sql_full.json "$OUT/oracle_sql.json"
  echo "== $q (native) start $(date +%T)"
  GRAFT_DUCKDB_MEM=${GRAFT_DUCKDB_MEM:-40GB} \
    timeout 14400 python3 tools/check_correctness.py "$SF" "$OUT" \
    --only "$q" --native "$q" --json "$REP/$q.json" > "$REP/$q.log" 2>&1
  echo "== $q done rc=$? $(date +%T)"
  sweep_spills
fi

# wrap <name> <cmd...>: run a scale checker whose MATCH verdict is its
# stdout tail + exit code, and record a report row the assembler merges.
wrap() {
  local q=$1; shift
  [ -s "$REP/$q.json" ] && { echo "== $q: report exists, skip"; return; }
  echo "== $q (checker: $1) start $(date +%T)"
  GRAFT_DUCKDB_MEM=${GRAFT_DUCKDB_MEM:-40GB} \
    timeout 14400 "$@" > "$REP/$q.log" 2>&1
  local rc=$?
  python3 - "$q" "$rc" "$REP/$q.log" "$REP/$q.json" "$2" <<'EOF'
import json, sys
q, rc, log, out, checker = sys.argv[1:6]
rc = int(rc)
tail = open(log, errors="replace").read()[-4000:]
ok = rc == 0 and "MATCH" in tail
detail = f"checker: {checker}" if ok else \
    f"checker {checker} rc={rc}; log tail: {tail[-300:]}"
json.dump({"sf_dir": "/tmp/sf100x", "ok": int(ok), "failed": int(not ok),
           "queries": {q: {"rows": -1 if not ok else 0, "match": ok,
                           "detail": detail}}},
          open(out, "w"), indent=1, sort_keys=True)
EOF
  echo "== $q done rc=$rc $(date +%T)"
  sweep_spills
}

want() { [ -z "${GRAFT_GATE_QUERIES:-}" ] || [[ " $QUERIES " == *" $1 "* ]]; }
# q_minhash_lsh_auto: full oracle is ~hours at this mult — validated
# stride-4 sub-block compare (cutover rule in SCALE.md).
want q_minhash_lsh_auto && \
  wrap q_minhash_lsh_auto python3 tools/check_minhash_subset.py "$SF" "$OUT" 4
# q_embed_keepers_auto: chunked DuckDB + union-find consolidation checker.
want q_embed_keepers_auto && \
  wrap q_embed_keepers_auto python3 tools/check_embed_keepers.py "$SF" "$OUT"

echo "== r17 gate pass complete $(date +%T)"
