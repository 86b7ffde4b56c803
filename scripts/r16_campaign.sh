#!/bin/bash
# Round-16 campaign (VERDICT r15 asks #1 and #6), four stages on
# 10M x 64d — the first >5M tier measured at a NON-starved rounds
# knob, plus the chunked-path identity at the same tier:
#  A) build10m_i9: stack mc12 iters=9 via the BROADCAST path (12M
#     bcast ceiling, 104g heap — r15 measured the 10M HashedRelation
#     refusing 80g and building at 104g). The rounds axis at 10M:
#     the only existing 10M recall point is iters=5 (0.010/0.026/
#     0.059), two knobs below the measured-good 5M operating point;
#     the ~+0.065/round-pair slope has no >5M measurement. BUILD
#     ONLY, graph saved — r15's beam stage OOM-killed the 104g JVM
#     when run in the same process as the build while gate jobs ran.
#  B) beams10m_i9: three beam tiers (16:4, 32:6, 64:8) + recall,
#     SEARCH-ONLY on the saved stage-A graph at 48g.
#  C) bcast10m_i2: broadcast-path build at iters=2, saved — the
#     reference half of the chunked-identity check (D).
#  D) chunk10m_i2: the SAME config through the chunked pruned-spill
#     shuffle path (default 4M bcast ceiling -> layers 0 and 1
#     chunked), saved. GraphCompare then asserts C == D bit-for-bit:
#     the spec-locked three-way identity (NnDescentSpec, sf0.001),
#     demonstrated at the failing scale.
# Usage: r16_campaign.sh [stage-regex]
set -uo pipefail
cd "$(dirname "$0")/.."
ONLY=${1:-.}
RUNDIR=/tmp/graft_r16_local
mkdir -p "$RUNDIR"
SCRATCH=target/r16_scratch.log
: >> "$SCRATCH"

run_stage() { # name heap n filter [VAR=VAL ...]
  local name=$1 heap=$2 n=$3 filter=$4
  shift 4
  if ! echo "$name" | grep -Eq "$ONLY"; then
    echo "skip $name (stage filter '$ONLY')" >> "$SCRATCH"
    return 0
  fi
  local log=target/r16_${name}.log
  env SPARK_DRIVER_MEM="$heap" SPARK_GRAFT_CPUS=32 \
    SPARK_LOCAL_DIR="$RUNDIR" "$@" \
    scripts/scalebench.sh "$n" 64 "$filter" > "$log" 2>&1 &
  local pid=$!
  echo "stage $name pid $pid started $(date +%H:%M:%S)" >> "$SCRATCH"
  local peak=0 kb gb
  while kill -0 "$pid" 2>/dev/null; do
    kb=$(du -sk "$RUNDIR" 2>/dev/null | awk '{s+=$1} END {print s+0}')
    gb=$((kb / 1048576))
    [ "$gb" -gt "$peak" ] && peak=$gb
    echo "$(date +%H:%M:%S) $name scratch_gb=$gb peak_gb=$peak" >> "$SCRATCH"
    if [ "$gb" -gt 64 ]; then
      echo "ABORT $name: scratch ${gb}GB > 64GB guard" >> "$SCRATCH"
      kill "$pid"
      break
    fi
    sleep 30
  done
  wait "$pid"
  echo "done $name rc=$? peak_gb=$peak at $(date +%H:%M:%S)" >> "$SCRATCH"
}

run_stage build10m_i9 104g 10000000 'graph_nnd_build' \
  SPARK_GRAFT_GRAPH_ITERS=9 SPARK_GRAFT_NND_MIDCAP=12 \
  SPARK_GRAFT_NND_BCAST_ROWS=12000000 \
  SPARK_GRAFT_GRAPH_SAVE=target/graphs_10m_stack_mc12_i9

run_stage beams10m_i9 48g 10000000 \
  'graph_stack_search_100q|graph_stack_recall_100q' \
  SPARK_GRAFT_GRAPH_BEAMS="16:4,32:6,64:8" \
  SPARK_GRAFT_GRAPH_LOAD=target/graphs_10m_stack_mc12_i9

run_stage bcast10m_i2 104g 10000000 'graph_nnd_build' \
  SPARK_GRAFT_GRAPH_ITERS=2 SPARK_GRAFT_NND_MIDCAP=12 \
  SPARK_GRAFT_NND_BCAST_ROWS=12000000 \
  SPARK_GRAFT_GRAPH_SAVE=target/graphs_10m_stack_mc12_i2_bcast

run_stage chunk10m_i2 80g 10000000 'graph_nnd_build' \
  SPARK_GRAFT_GRAPH_ITERS=2 SPARK_GRAFT_NND_MIDCAP=12 \
  SPARK_GRAFT_GRAPH_SAVE=target/graphs_10m_stack_mc12_i2_chunk

# E) the identity check the header promises: GraphCompare asserts
# stage C == stage D bit-for-bit. Gated on BOTH builds having
# completed rc=0 (their saved stacks carry parquet _SUCCESS markers),
# so a partial campaign rerun never diffs a half-written artifact.
if echo "identity" | grep -Eq "$ONLY" \
    && [ -f target/graphs_10m_stack_mc12_i2_bcast/stack/_SUCCESS ] \
    && [ -f target/graphs_10m_stack_mc12_i2_chunk/stack/_SUCCESS ]; then
  env SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
    GRAFT_MAIN=graft.tools.GraphCompare \
    scripts/scalebench.sh \
    target/graphs_10m_stack_mc12_i2_bcast/stack \
    target/graphs_10m_stack_mc12_i2_chunk/stack \
    > target/r16_identity.log 2>&1
  echo "identity rc=$? (see target/r16_identity.log)" >> "$SCRATCH"
else
  echo "identity skipped (stage filter or missing _SUCCESS)" >> "$SCRATCH"
fi

echo "campaign complete $(date +%H:%M:%S)" >> "$SCRATCH"
