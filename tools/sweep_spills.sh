# Remove only DuckDB spill dirs whose owning checker process is DEAD.
# Sourced by the gate scripts; contract pinned by tools/test_sweep_spills.py.
#
# History: the first r17 gate run used a bare `rm -rf /tmp/duckdb-gate-
# spill-*` and, with two gate halves running concurrently, each completed
# query in one half wiped the OTHER half's LIVE spill dir — DuckDB aborts
# (rc=134/139) the moment it next touches its temp storage. Six queries
# died that way. The dir name ends in the checker's PID, so liveness is
# checkable with kill -0.
sweep_spills() {
  local d pid
  for d in /tmp/duckdb-*spill-*; do
    [ -e "$d" ] || continue
    pid=${d##*-}
    case $pid in ''|*[!0-9]*) continue;; esac
    kill -0 "$pid" 2>/dev/null || rm -rf "$d"
  done
}
