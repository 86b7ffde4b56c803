#!/bin/bash
# Round-17 campaign (VERDICT r16 asks #1, #3, #4) on 10M x 64d.
#
#  A) mc16_i5: the WIDTH axis at 10M through the CHUNKED path —
#     stack midCap 16, iters=5, default 4M broadcast ceiling (so the
#     10M and 5M layers score through chunked shuffle passes), graph
#     saved, then beam tiers b16r4/b32r6/b64r8 + recall IN-PROCESS
#     (the graph is saved before the search stages, so a search crash
#     cannot lose the build). Compared against r15's mc12 iters=5 row
#     (0.010/0.026/0.059) this isolates width at 10M with iters
#     matched. Why mc16 and not the verdict's mc24: the chunked path
#     bounds the vector-carrying SHUFFLE, but each round still
#     materialises the candidate-ID set once (the spill the passes
#     prune); at mc24 that set is 10M*(24^2+16) = 5.92e9 rows — ~65 GB
#     as lz4 parquet, over this box's free disk BEFORE any shuffle
#     byte. mc16's 2.72e9 rows (~35 GB) fit. On a fleet the spill is
#     aggregate-scratch-bound and mc24 fits trivially; the one-box
#     width ceiling is the id-spill floor, documented in PLANS.
#  B) insert10m_100k / insert10m_50k: q56 insertBatch against the
#     SAVED r16 iters=9 graph at both sides of the driver-top flip
#     (batch 100k > driverTopRows 64k -> all-distributed; 50k under it
#     -> driver-resident top), with self-findability + held-out
#     post-insert recall. Search-only heap (48g).
#  C) beamsat: beam tiers 5-6 (b256r12, b512r14) on the saved iters=9
#     graph — where does query-time effort stop paying?
# Stages are box-exclusive (memory): run one at a time.
# Usage: r17_campaign.sh <stage-regex>
set -uo pipefail
cd "$(dirname "$0")/.."
ONLY=${1:-.}
RUNDIR=/tmp/graft_r17_local
mkdir -p "$RUNDIR"
SCRATCH=target/r17_scratch.log
: >> "$SCRATCH"

run_stage() { # name heap n filter [VAR=VAL ...]
  local name=$1 heap=$2 n=$3 filter=$4
  shift 4
  if ! echo "$name" | grep -Eq "$ONLY"; then
    echo "skip $name (stage filter '$ONLY')" >> "$SCRATCH"
    return 0
  fi
  local log=target/r17_${name}.log
  env SPARK_DRIVER_MEM="$heap" SPARK_GRAFT_CPUS=32 \
    SPARK_LOCAL_DIR="$RUNDIR" GRAFT_CP="${GRAFT_CP:-target/scala-2.13/classes}" "$@" \
    scripts/scalebench.sh "$n" 64 "$filter" > "$log" 2>&1 &
  local pid=$!
  echo "stage $name pid $pid started $(date +%H:%M:%S)" >> "$SCRATCH"
  local peak=0 kb gb
  while kill -0 "$pid" 2>/dev/null; do
    kb=$(du -sk "$RUNDIR" 2>/dev/null | awk '{s+=$1} END {print s+0}')
    gb=$((kb / 1048576))
    [ "$gb" -gt "$peak" ] && peak=$gb
    echo "$(date +%H:%M:%S) $name scratch_gb=$gb peak_gb=$peak" >> "$SCRATCH"
    if [ "$gb" -gt 68 ]; then
      echo "ABORT $name: scratch ${gb}GB > 68GB guard" >> "$SCRATCH"
      kill "$pid"
      break
    fi
    sleep 30
  done
  wait "$pid"
  echo "done $name rc=$? peak_gb=$peak at $(date +%H:%M:%S)" >> "$SCRATCH"
}

run_stage mc16_i2 80g 10000000 \
  'graph_nnd_build|graph_stack_search_100q|graph_stack_recall_100q' \
  SPARK_GRAFT_GRAPH_ITERS=2 SPARK_GRAFT_NND_MIDCAP=16 \
  SPARK_GRAFT_GRAPH_BEAMS="16:4,32:6,64:8" \
  SPARK_GRAFT_GRAPH_SAVE=target/graphs_10m_stack_mc16_i2

run_stage insert10m_100k 64g 10000000 \
  'graph_insert|graph_tombstone|graph_compact' \
  SPARK_GRAFT_INSERT_N=100000 \
  SPARK_GRAFT_GRAPH_LOAD=target/graphs_10m_stack_mc12_i9

run_stage insert10m_50k 64g 10000000 'graph_insert' \
  SPARK_GRAFT_INSERT_N=50000 \
  SPARK_GRAFT_GRAPH_LOAD=target/graphs_10m_stack_mc12_i9

# Compaction in its intended regime: cap ABOVE the i9 graph's degree
# mode (avg 36.7 — cap 48 catches only the accreted tail; the
# cap-32 point measured 3.79M touched = a rebuild-class prune that
# filled one box's disk). Compact-only: operates on the loaded stack.
run_stage compact48 64g 10000000 'graph_compact' \
  SPARK_GRAFT_COMPACT_CAP=48 \
  SPARK_GRAFT_GRAPH_LOAD=target/graphs_10m_stack_mc12_i9

run_stage beamsat 48g 10000000 \
  'graph_stack_search_100q|graph_stack_recall_100q' \
  SPARK_GRAFT_GRAPH_BEAMS="256:12,512:14" \
  SPARK_GRAFT_GRAPH_LOAD=target/graphs_10m_stack_mc12_i9

echo "campaign complete $(date +%H:%M:%S)" >> "$SCRATCH"
