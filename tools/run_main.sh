#!/bin/bash
# Launch a graft main class directly against the compiled classes —
# sbt-free, so ladder corpus builds / adjudication sweeps can run while
# sbt holds the project lock (tests, compiles). Mirrors build.sbt's
# forked-JVM options (JDK17 add-opens, UTC, heap from SPARK_DRIVER_MEM).
# Usage: tools/run_main.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
