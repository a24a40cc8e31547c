#!/bin/bash
# Direct-JVM runner for graft mains — same fork options as build.sbt
# (jdk17 --add-opens, UTC, UI off, SPARK_DRIVER_MEM heap), but without
# the sbt launcher/lock, so long-running tools can overlap. Usage:
#   tools/jrun.sh graft.Verify /root/testdata/sf0.01 /tmp/out
# Requires `sbt compile` to have produced target/scala-2.13/classes.
set -euo pipefail
cd "$(dirname "$0")/.."
# GRAFT_CLASSES lets a long-running background job pin a snapshot of
# the compiled classes so concurrent recompiles can't swap class files
# under its lazy classloading.
CLS=${GRAFT_CLASSES:-target/scala-2.13/classes}
# paste -sd: joins without a trailing ':' (a trailing colon would
# silently add the cwd to the classpath)
CP="$CLS:$(ls /opt/spark/jars/*.jar | paste -sd:)"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
