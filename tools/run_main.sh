#!/bin/bash
# Run a graft main class on the compiled classes WITHOUT sbt — so a
# long-running sweep (ScaleBench / ScaleValidate) does not hold the sbt
# build lock while specs compile and run in the foreground.
#
# Usage: tools/run_main.sh <mainClass> [args...]
#   GRAFT_CLASSES  override the classes dir (default target/scala-2.13/classes;
#                  copy it first if you plan to recompile mid-run)
#   SPARK_DRIVER_MEM  heap (default 8g)
#
# The --add-opens set mirrors build.sbt's jdk17AddOpens (Spark 4.x on
# JDK 17 outside spark-submit).
set -euo pipefail
CLS_DIR=${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLS_DIR:/opt/spark/jars/*" "$@"
