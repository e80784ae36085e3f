#!/usr/bin/env bash
# Direct JVM runner for graft mains (no sbt lock): tools/runjava.sh <MainClass> [args...]
# Mirrors build.sbt javaOptions (add-opens, UTC, no UI, 8g heap).
set -u
CP=/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')
ADD=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD="$ADD --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN=$1; shift
exec java $ADD -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "graft.$MAIN" "$@"
