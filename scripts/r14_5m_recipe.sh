#!/bin/bash
# Round-14 5M recall-recipe campaign: the mc16/iters=9 configuration
# PLANS.md:round-13 named but could not run in-session. Launches the
# stack-variant graph build + the b16r4/b32r6 search/recall stages on
# 5M x 64d, with a scratch watchdog (samples /tmp every 30s, aborts the
# JVM if Spark scratch exceeds 70 GB) and a peak record.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=target/r14_5m_recipe.log
SCRATCH=target/r14_5m_scratch.log
: > "$SCRATCH"
# 80g, not r13's 48g: the decorrelated cap samples (round-14 fix)
# produce more DISTINCT candidate pairs per round — the same capped
# counts but fewer duplicates — and the 5M top-k aggregate OOM'd a
# 48g heap in round 2 (TopKHeap.fromBytes) on the first attempt.
# Shuffle width: since round 15 NnDescent auto-sizes its own build
# width from the per-round candidate volume (~10M rows/task), so this
# template no longer needs SPARK_GRAFT_SHUFFLE_PARTITIONS — exporting
# it would OVERRIDE the auto-sizer (manual calibration only).
# SPARK_LOCAL_DIR scopes the scratch watchdog to THIS run (a
# concurrent Spark job's /tmp dirs must not trip the guard).
LOCALDIR=/tmp/graft_r14_recipe_local
mkdir -p "$LOCALDIR"
SPARK_DRIVER_MEM=80g SPARK_GRAFT_CPUS=32 SPARK_LOCAL_DIR="$LOCALDIR" \
  SPARK_GRAFT_GRAPH_ITERS=9 SPARK_GRAFT_NND_MIDCAP=16 \
  SPARK_GRAFT_NND_BCAST_ROWS=6000000 \
  SPARK_GRAFT_GRAPH_BEAMS="16:4,32:6" \
  scripts/scalebench.sh 5000000 64 'graph_nnd_build|graph_stack_' \
  > "$LOG" 2>&1 &
PID=$!
echo "scalebench pid $PID" >> "$SCRATCH"
PEAK=0
while kill -0 $PID 2>/dev/null; do
  KB=$(du -sk "$LOCALDIR" 2>/dev/null | awk '{s+=$1} END {print s+0}')
  GB=$((KB / 1048576))
  [ "$GB" -gt "$PEAK" ] && PEAK=$GB
  echo "$(date +%H:%M:%S) scratch_gb=$GB peak_gb=$PEAK" >> "$SCRATCH"
  if [ "$GB" -gt 70 ]; then
    echo "ABORT: scratch ${GB}GB > 70GB guard" >> "$SCRATCH"
    kill $PID
    break
  fi
  sleep 30
done
wait $PID
RC=$?
echo "done rc=$RC peak_gb=$PEAK" >> "$SCRATCH"
exit $RC
