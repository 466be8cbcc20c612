#!/bin/bash
# Round-18 staged oracle gate for the remaining mult=1000 pending
# compares. One check_correctness.py process per query (DuckDB segfault
# isolation), per-query JSON reports merged by tools/assemble_r18.py.
# Restores the full oracle_sql.json before every invocation (a finished
# Verify run rewrites it filtered to its subset).
set -u
cd "$(dirname "$0")/.."
SF=${GRAFT_GATE_SF:-/tmp/sf100x}
OUT=${GRAFT_GATE_OUT:-/tmp/verify_sf1000_out}
REP=${GRAFT_GATE_REP:-/tmp/r18_gate}
mkdir -p "$REP"

# The sweep's liveness contract is pinned by a test that runs before the
# gate does any sweeping (VERDICT r17 item 8).
python3 tools/test_sweep_spills.py || exit 3
. tools/sweep_spills.sh

MED="q_corpus_delta q_repetition q_minhash_lsh q_dedup_keepers q_ngram_jaccard q_corpus_build"
# GRAFT_GATE_QUERIES overrides the list — lets the harness run two gate
# processes over disjoint halves (per-process spill dirs + per-query
# reports make that safe; keep the BIG oracles serial on one side).
QUERIES=${GRAFT_GATE_QUERIES:-"$MED q_tokenize q_minhash_lsh_auto"}

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

want() { [[ " $QUERIES " == *" $1 "* ]]; }

# q_tokenize: 271M-row result — DuckDB-native EXCEPT-ALL compare.
q=q_tokenize
if want $q && [ ! -s "$REP/$q.json" ]; then
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

# q_minhash_lsh_auto: full oracle is ~hours at this mult — validated
# stride-4 sub-block compare (cutover rule in SCALE.md).
want q_minhash_lsh_auto && \
  wrap q_minhash_lsh_auto python3 tools/check_minhash_subset.py "$SF" "$OUT" 4
# q_embed_keepers_auto: chunked DuckDB + union-find consolidation checker.
want q_embed_keepers_auto && \
  wrap q_embed_keepers_auto python3 tools/check_embed_keepers.py "$SF" "$OUT"

echo "== r18 gate pass complete $(date +%T)"
