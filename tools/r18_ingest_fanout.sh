#!/bin/bash
# Round-18 ingest fan-out past the driver-publisher floor (VERDICT r17
# item 3). The r17 profile pinned ~4.7-4.9k docs/s on BOTH 2x8 and 4x8
# local-cluster topologies with the single in-JVM topic publisher — the
# floor, because one source thread fed row-encode + the first shuffle.
# This re-runs the SAME selective-ingest pipeline with the PARTITIONED
# parquetStream lake source (StreamBench SPARK_GRAFT_INGEST_SOURCE=lake:
# 64 staged part-files, 8 per trigger -> 8 parallel scan tasks/batch)
# across three topologies, min-of-2 fresh JVMs each. If topology moves
# docs/s here, source partitioning was the bound; if not, the bound is
# elsewhere (state/claim-window) and the table says where.
set -euo pipefail
cd "$(dirname "$0")/.."
OUTLOG=${1:-/tmp/r18_ingest_fanout.jsonl}
: > "$OUTLOG"

LIB=$(find "$HOME/.cache/coursier" -name "scala-library-2.13.17.jar" | head -1)
APPJAR=$(ls target/scala-2.13/gostreamingspark_2.13-*.jar 2>/dev/null | head -1)
[ -n "$APPJAR" ] || { echo "run 'sbt package' first (local-cluster executors need the app jar)" >&2; exit 2; }
CP="target/scala-2.13/classes:/opt/spark/jars/*:$LIB"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

run_cell() { # $1=master-label $2=master(empty=local[32]) $3=rep
  echo "== master=$1 rep=$3 start $(date +%T)" >&2
  local envs=(SPARK_GRAFT_INGEST_SOURCE=lake
    SPARK_GRAFT_INGEST_N=100000
    SPARK_GRAFT_INGEST_UNIQUE=1
    SPARK_GRAFT_INGEST_SRC_FILES=64
    SPARK_GRAFT_INGEST_SRC_MAXFILES=8)
  if [ -n "$2" ]; then
    # local-cluster worker JVMs build the EXECUTOR command themselves
    # via AbstractCommandBuilder: without SPARK_HOME they cannot find
    # the jars dir, and without SPARK_SCALA_VERSION (normally set by
    # bin/load-spark-env.sh, which a bare-java launch bypasses) they
    # die with "Cannot find any build directories" before running a
    # single task.
    envs+=(SPARK_GRAFT_MASTER="$2" SPARK_GRAFT_JARS="$PWD/$APPJAR"
      SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13)
  fi
  env "${envs[@]}" \
    java $OPENS -Xmx16g -XX:+UnlockDiagnosticVMOptions \
    -XX:GCLockerRetryAllocationCount=100 \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.StreamBench 20000 2>/dev/null \
    | grep '^{' \
    | sed "s/^{/{\"topology\":\"$1\",\"rep\":$3,/" >> "$OUTLOG"
}

for rep in 1 2; do
  run_cell "local32" "" "$rep"
  run_cell "2x8" "local-cluster[2,8,4096]" "$rep"
  run_cell "4x8" "local-cluster[4,8,4096]" "$rep"
done
echo "== r18 ingest fan-out complete $(date +%T)" >&2
