#!/bin/bash
# Launch a graft main class directly on the JVM (no sbt overhead).
# Usage: tools/run.sh <mainClass> [args...]   e.g.
#   tools/run.sh graft.Verify /root/testdata/sf0.001 /tmp/out
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GC tuning for lazily-backed VM memory (page faults are ~40MB/s here):
# an unbounded G1 young gen balloons into untouched pages and every young
# collection faults them in (~700ms/GC measured → 2s queries become 20-70s).
# AlwaysPreTouch is NOT the answer — pretouching 12g took 5 minutes.
# Bounding the young gen keeps the touched working set small and reused.
# 16g (r9): at 360 registered queries the accumulated session state
# (pins, checkpointed relations, broadcast cleanup lag) pressures a 10g
# heap late in a full-suite run — measured 457.5 s (10g) vs 411.9 s
# (16g) on the same build/state. Still pinned Xms=Xmx (see below).
MEM="${SPARK_DRIVER_MEM:-16g}"
# -Xms = -Xmx: G1 otherwise UNCOMMITS heap after major collections, and the
# uncommitted pages re-fault at 40MB/s the next time a query touches them
# (observed as tens-of-seconds swings on identical queries across runs).
# A fixed-size heap never returns pages, so once faulted-in they stay warm.
exec java $ADD_OPENS \
  -Xms"$MEM" -Xmx"$MEM" -XX:+UnlockExperimentalVMOptions -XX:G1MaxNewSizePercent=10 -XX:MaxGCPauseMillis=100 \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
