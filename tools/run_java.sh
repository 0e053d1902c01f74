#!/bin/bash
# Run a graft main class with the same JVM flags sbt forks with
# (build.sbt javaOptions). Usage: tools/run_java.sh <MainClass> [args...]
# Classpath comes from /tmp/graft_cp.txt (sbt "export Runtime/fullClasspath").
CP_FILE="${GRAFT_CP_FILE:-/tmp/graft_cp.txt}"
if [ ! -f "$CP_FILE" ]; then
  echo "classpath file $CP_FILE missing; run: sbt -batch 'export Runtime/fullClasspath' | grep -v '^\[' | tail -1 > $CP_FILE" >&2
  exit 1
fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -cp "$(cat "$CP_FILE")" $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-40g}" \
  -XX:ReservedCodeCacheSize=1g \
  $GRAFT_EXTRA_JVM_OPTS \
  "$@"
