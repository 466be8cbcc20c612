#!/bin/bash
# Round-17 Spark-side re-dump at mult=1000: the 31 r16 pending_oracle
# queries plus the new q_embed_keepers_auto. Scale dials per SCALE.md's
# seventh-point recipe (periodic GC rides along automatically once the
# dials are set — Sessions.tune).
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/tmp/sf100x}
OUT=${2:-/tmp/verify_sf1000_out}
# GRAFT_DUMP_QUERIES overrides the list: on a slow host the gate runs
# cheap-first (dump LIGHT queries, oracle them while the heavy tail
# dumps) so partial progress is certifiable at round end.
PENDING=${GRAFT_DUMP_QUERIES:-"q_ann_ivf,q_corpus_build,q_corpus_delta,q_dedup_keepers,q_dup_spans,q_edit_distance,q_ewma,q_hash_split,q_kmeans_step,q_logreg_step,q_media_audiohash,q_media_meta,q_media_phash,q_minhash_lsh,q_minhash_lsh_auto,q_neardup_components,q_ngram_jaccard,q_pii_redact,q_pipeline_composite,q_pq_rerank,q_quality_calibrate,q_quality_drift,q_repetition,q_semdedup,q_semi_join,q_sql_surface,q_token_packing,q_tokenize,q_unigram_nll,q_window_sum,q_zorder3,q_embed_keepers_auto"}
# Scratch + heap are host-dependent dials now: this round's host writes
# buffered (page-cache) data to its virtio disk at ~17 MB/s while O_DIRECT
# runs at 375 MB/s — writeback-throttled, so multi-GB shuffle stages that
# ran from page cache on a 252 GB host crawl here (one query wrote 16 GB
# of shuffle at 16 MB/s before being killed). Point SPARK_LOCAL_DIRS at a
# SIZE-CAPPED tmpfs (mount -t tmpfs -o size=55g tmpfs /mnt/shuffle): RAM-
# speed shuffle, and an oversized query dies on ENOSPC (caught per-query
# by Verify.dumpAll) instead of summoning the kernel OOM killer.
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=${SPARK_GRAFT_DRIVER_MEM:-52g} \
  SPARK_LOCAL_DIRS=${SPARK_LOCAL_DIRS:-/mnt/shuffle} \
  SPARK_GRAFT_VERIFY_PARTS=8 \
  SPARK_GRAFT_INITIAL_PARTITIONS=512 \
  SPARK_GRAFT_BROADCAST_THRESHOLD=512m \
  SPARK_GRAFT_VERIFY_ONLY="$PENDING" \
  sbt -batch "runMain graft.Verify $SF $OUT"
echo "== dump errors:"
cat "$OUT/errors.json"
