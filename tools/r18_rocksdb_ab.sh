#!/bin/bash
# Round-18 paired RocksDB-dial verdict at the large-state binding point
# (VERDICT r17 item 2). The r17 sweep measured +19% at 1.86M live keys
# and -15% at 5.41M for the 256MB-cache/track-rows-off dials — both
# single-shot, inside the host's noise envelope. This runs the paired
# design that turns it into a claim: same day, same host, INTERLEAVED
# A/B (defaults vs dials), three reps per cell, at BOTH populations.
# Each rep is a fresh JVM; the profile prints out-parity per run so
# keeper parity is self-verifying. min-of-3 is computed by the reader
# (tools/r18_rocksdb_ab_summarize.py), not in here.
set -euo pipefail
cd "$(dirname "$0")/.."
OUTLOG=${1:-/tmp/r18_rocksdb_ab.jsonl}
: > "$OUTLOG"

LIB=$(find "$HOME/.cache/coursier" -name "scala-library-2.13.17.jar" | head -1)
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*:$LIB"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

run_cell() { # $1=n_docs $2=config(label) $3=cache_mb $4=track_rows $5=rep
  echo "== n=$1 config=$2 rep=$5 start $(date +%T)" >&2
  SPARK_GRAFT_STATE_STORE=rocksdb \
  SPARK_GRAFT_INGEST_PROFILE=1 \
  SPARK_GRAFT_INGEST_N="$1" \
  SPARK_GRAFT_INGEST_UNIQUE=1 \
  SPARK_GRAFT_INGEST_STEP_MS=0 \
  SPARK_GRAFT_INGEST_CHUNK=50000 \
  SPARK_GRAFT_INGEST_STAGES=band_state \
  SPARK_GRAFT_ROCKSDB_BLOCK_CACHE_MB="$3" \
  SPARK_GRAFT_ROCKSDB_TRACK_ROWS="$4" \
  java $OPENS -Xmx64g -XX:+UnlockDiagnosticVMOptions \
    -XX:GCLockerRetryAllocationCount=100 \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.StreamBench 20000 2>/dev/null \
    | grep '^{' \
    | sed "s/^{/{\"config\":\"$2\",\"rep\":$5,/" >> "$OUTLOG"
}

for n in 1000000 3000000; do
  for rep in 1 2 3; do
    run_cell "$n" defaults 8 true "$rep"
    run_cell "$n" dials 256 false "$rep"
  done
done
echo "== r18 rocksdb A/B complete $(date +%T)" >&2
