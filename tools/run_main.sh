#!/usr/bin/env bash
# Run a graft main class from the PACKAGED jar (sbt package first) outside
# sbt — lets long stress/verify runs proceed while sbt keeps compiling in
# target/classes without classfile races. JVM flags mirror build.sbt.
set -euo pipefail
JAR=/root/repo/target/scala-2.13/kmeans_mapreducespark_2.13-0.1.0.jar
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing \
  -cp "$JAR:/opt/spark/jars/*" "$@"
