#!/bin/bash
# Raw-JVM ScaleBench runner: same JVM flags sbt's fork would inject
# (build.sbt jdk17AddOpens), but without holding the sbt project lock,
# so tests/compiles can run concurrently with a long measurement.
#   SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 scripts/scalebench.sh 5000000 64 'graph_'
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# maxResultSize: broadcasting a >4M-row vector table (the NND scoring
# fast path) collects >1 GB of task results; the 1g default killed the
# 5M build at the broadcast stage.
# Do NOT add -XX:+DisableExplicitGC here: NnDescent's per-round
# ContextCleaner nudge (System.gc() at multi-GB candidate volumes)
# becomes a silent no-op under it and two rounds of shuffle spill
# coexist on scratch — the measured 43.7-vs-26.7 GB peak regression.
# SPARK_LOCAL_DIR (optional): scope this run's shuffle/blockmgr
# scratch to its own directory so a campaign watchdog can du THIS
# run's usage without counting concurrent Spark jobs' /tmp dirs.
LOCALDIR_OPT=""
[ -n "${SPARK_LOCAL_DIR:-}" ] && LOCALDIR_OPT="-Dspark.local.dir=$SPARK_LOCAL_DIR"
# rdd.compress: the chunked shuffle-path scorer checkpoints the
# candidate-id set serialized to disk (~24 B/row raw at 10M = tens of
# GB); lz4 on those long-pair blocks roughly halves the largest fixed
# scratch item. Semantics-free (storage codec only).
# network/heartbeat timeouts: a campaign build's driver can stall for
# minutes at a time (full GC of an 80g heap at multi-GB candidate
# volumes, CPU contention from concurrent jobs); the 120s default let
# the heartbeater declare the driver dead MID-BUILD and tear down the
# SparkContext (measured: r17 mc16 build died at the round-2 peak
# with "Cannot find endpoint: CoarseGrainedScheduler"). Single-JVM
# local mode has no real network to time out on — raise both.
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.rdd.compress=true \
  -Dspark.network.timeout=600s \
  -Dspark.executor.heartbeatInterval=120s \
  -Dspark.driver.maxResultSize=8g $LOCALDIR_OPT \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "${GRAFT_CP:-target/scala-2.13/classes}":'/opt/spark/jars/*' \
  "${GRAFT_MAIN:-graft.ScaleBench}" "$@"
