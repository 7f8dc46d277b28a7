#!/usr/bin/env bash
# Direct-JVM bench launcher — identical JVM flags to build.sbt's forked
# `sbt runMain graft.Bench`, minus sbt itself: sbt holds a project-level
# lock, so scale sweeps launched this way leave sbt free for compiles,
# and the measured process carries no sbt supervision overhead.
#
# Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_REPS=2 \
#        SPARK_GRAFT_BENCH_OUT=... tools/bench_java.sh [MainClass] [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="${1:-graft.Bench}"; shift || true
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dlog4j2.configurationFile="file:$(pwd)/tools/log4j2-quiet.properties" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
