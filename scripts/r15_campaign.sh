#!/bin/bash
# Round-15 campaign (VERDICT r14 asks #1/#2/#3/#6), three stages run
# back to back on 5M x 64d:
#  B) div mc16 iters=9 with NO SPARK_GRAFT_SHUFFLE_PARTITIONS — the
#     auto-size proof: this exact config OOM'd an 80 GB heap at the
#     32-partition session default in round 14 and was rescued by a
#     human-exported env var; NnDescent.build now derives its width
#     from perRoundCand (1.36e9 -> 136 partitions) itself. Three beam
#     tiers (16:4, 32:6, 64:8 — the third point the two-point
#     beam-axis rule needs), graph SAVED for future search-only runs.
#  A) stack mc24 iters=9 — the width axis at 5M (no measured point
#     above mc16 existed; the 100 TB rule "scratch buys width" is
#     extrapolated from 200k/1M). perRoundCand = 5e6*576 + 8e7 =
#     2.96e9 -> auto width 296; projected scratch ~2.2x mc16's
#     31 GB = ~68 GB, inside the 74 GB guard (80 GB free on /) —
#     the watchdog aborts before the disk fills if the projection
#     is wrong. Same three beam tiers, graph saved.
#  C) d02's df-capped inverted index at 5M (the curation pipeline's
#     other shuffle-heavy leg; no measured point past 1M).
# Scratch watchdog scoped to THIS campaign's spark.local.dir
# (ADVICE r14: a shared /tmp du can abort an innocent run).
# Usage: r15_campaign.sh [stage-regex]  — run only matching stages
# (div_mc16|stack_mc24|d02); default all. Lets a later session pick
# up the stages an earlier one already measured without re-paying
# the ~1.2h div build.
set -uo pipefail
cd "$(dirname "$0")/.."
ONLY=${1:-.}
RUNDIR=/tmp/graft_r15_local
mkdir -p "$RUNDIR"
SCRATCH=target/r15_scratch.log
: > "$SCRATCH"

run_stage() { # name filter [VAR=VAL ...]
  local name=$1 filter=$2
  shift 2
  if ! echo "$name" | grep -Eq "$ONLY"; then
    echo "skip $name (stage filter '$ONLY')" >> "$SCRATCH"
    return 0
  fi
  local log=target/r15_${name}.log
  env SPARK_DRIVER_MEM=80g SPARK_GRAFT_CPUS=32 \
    SPARK_LOCAL_DIR="$RUNDIR" "$@" \
    scripts/scalebench.sh 5000000 64 "$filter" > "$log" 2>&1 &
  local pid=$!
  echo "stage $name pid $pid started $(date +%H:%M:%S)" >> "$SCRATCH"
  local peak=0 kb gb
  while kill -0 "$pid" 2>/dev/null; do
    kb=$(du -sk "$RUNDIR" 2>/dev/null | awk '{s+=$1} END {print s+0}')
    gb=$((kb / 1048576))
    [ "$gb" -gt "$peak" ] && peak=$gb
    echo "$(date +%H:%M:%S) $name scratch_gb=$gb peak_gb=$peak" >> "$SCRATCH"
    if [ "$gb" -gt 74 ]; then
      echo "ABORT $name: scratch ${gb}GB > 74GB guard" >> "$SCRATCH"
      kill "$pid"
      break
    fi
    sleep 30
  done
  wait "$pid"
  echo "done $name rc=$? peak_gb=$peak at $(date +%H:%M:%S)" >> "$SCRATCH"
}

run_stage div_mc16 'graph_div_' \
  SPARK_GRAFT_GRAPH_ITERS=9 SPARK_GRAFT_NND_MIDCAP=16 \
  SPARK_GRAFT_NND_BCAST_ROWS=6000000 \
  SPARK_GRAFT_GRAPH_BEAMS="16:4,32:6,64:8" \
  SPARK_GRAFT_GRAPH_SAVE=target/graphs_5m_div_mc16

run_stage stack_mc24 'graph_nnd_build|graph_stack_' \
  SPARK_GRAFT_GRAPH_ITERS=9 SPARK_GRAFT_NND_MIDCAP=24 \
  SPARK_GRAFT_NND_BCAST_ROWS=6000000 \
  SPARK_GRAFT_GRAPH_BEAMS="16:4,32:6,64:8" \
  SPARK_GRAFT_GRAPH_SAVE=target/graphs_5m_stack_mc24

run_stage d02 'dedup_shingles|dedup_ngram_jaccard'

echo "campaign complete $(date +%H:%M:%S)" >> "$SCRATCH"
