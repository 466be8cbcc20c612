#!/bin/bash
# Round-18 Spark-side dump at mult=1000: successor to r17_dump.sh with
# the ADVICE-r17 scratch preflight. Scale dials per SCALE.md's
# seventh-point recipe (periodic GC rides along automatically once the
# dials are set — Sessions.tune).
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/tmp/sf100x}
OUT=${2:-/tmp/verify_sf1000_out}
# GRAFT_DUMP_QUERIES overrides the list: on a slow host the gate runs
# cheap-first (dump LIGHT queries, oracle them while the heavy tail
# dumps) so partial progress is certifiable at round end.
PENDING=${GRAFT_DUMP_QUERIES:-"q_ann_ivf,q_corpus_build,q_corpus_delta,q_dedup_keepers,q_dup_spans,q_edit_distance,q_ewma,q_kmeans_step,q_media_audiohash,q_media_meta,q_media_phash,q_minhash_lsh,q_minhash_lsh_auto,q_neardup_components,q_ngram_jaccard,q_repetition,q_semdedup,q_tokenize,q_unigram_nll"}

# Scratch preflight (ADVICE r17): SPARK_LOCAL_DIRS must be a mounted
# size-capped tmpfs. On a writeback-throttled host (~17 MB/s buffered to
# virtio while O_DIRECT runs 375 MB/s) a plain directory on the slow disk
# silently reproduces the exact pathology this script exists to avoid —
# one query wrote 16 GB of shuffle at 16 MB/s before being killed — and
# an absent mount point fails only AFTER the sbt build. Fail fast with
# the mount command instead of defaulting blindly.
SCRATCH=${SPARK_LOCAL_DIRS:-/mnt/shuffle}
if [ ! -d "$SCRATCH" ] || [ "$(stat -f -c %T "$SCRATCH")" != "tmpfs" ]; then
  echo "ERROR: $SCRATCH is not a mounted tmpfs (got: $(stat -f -c %T "$SCRATCH" 2>/dev/null || echo absent))." >&2
  echo "  Shuffle scratch MUST be a size-capped tmpfs so multi-GB shuffle" >&2
  echo "  stages run at RAM speed and an oversized query dies on ENOSPC" >&2
  echo "  (caught per-query by Verify.dumpAll) instead of summoning the" >&2
  echo "  kernel OOM killer or crawling on writeback-throttled disk." >&2
  echo "  Fix:  mkdir -p $SCRATCH && mount -t tmpfs -o size=55g tmpfs $SCRATCH" >&2
  echo "  (or point SPARK_LOCAL_DIRS at an existing tmpfs)" >&2
  exit 2
fi

SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=${SPARK_GRAFT_DRIVER_MEM:-52g} \
  SPARK_LOCAL_DIRS="$SCRATCH" \
  SPARK_GRAFT_VERIFY_PARTS=8 \
  SPARK_GRAFT_INITIAL_PARTITIONS=512 \
  SPARK_GRAFT_BROADCAST_THRESHOLD=512m \
  SPARK_GRAFT_VERIFY_ONLY="$PENDING" \
  sbt -batch "runMain graft.Verify $SF $OUT"
echo "== dump errors:"
cat "$OUT/errors.json"
