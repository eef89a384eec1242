#!/bin/bash
# Bare-JVM launcher for graft mains (Bench, Verify, tools.*) — used when
# sbt's single-server-per-repo rule blocks a second concurrent run
# (cross-process specs, bench sweeps alongside a test build). Mirrors
# build.sbt's forked-run JVM options (JDK17 add-opens for Spark 4.x
# outside spark-submit) and the unmanaged /opt/spark/jars classpath.
# Usage: GRAFT_MEM=24g tools/run-bare.sh graft.Bench [args...]
set -euo pipefail
MEM="${GRAFT_MEM:-8g}"
# classpath is relative to the invoking directory so git-worktree builds
# (e.g. a baseline checkout for before/after plan dumps) run their OWN
# classes rather than silently picking up /root/repo's
ROOT="$(pwd)"
CP="$ROOT/target/scala-2.13/classes:/opt/spark/jars/*"
if [[ "${GRAFT_TEST_CP:-0}" == "1" ]]; then
  CP="$ROOT/target/scala-2.13/test-classes:$CP"
fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -cp "$CP" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" ${GRAFT_JVM_OPTS:-} "$@"
