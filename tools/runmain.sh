#!/bin/bash
# Fork a graft diagnostic main on the compiled classpath WITHOUT sbt —
# no build-lock contention, no 80 s sbt startup. Compile first
# (`sbt -batch compile`); classpath = target classes + /opt/spark/jars.
# Usage: tools/runmain.sh <MainClass> [args...]
#   env: RUNMAIN_MEM (default 16g), cwd = repo root unless RUNMAIN_CWD set
set -euo pipefail
# classpath derives from the script-relative repo root (resolved BEFORE
# any RUNMAIN_CWD cd), so the script works from any checkout location
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "${RUNMAIN_CWD:-$REPO}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="$REPO/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java $ADD_OPENS -Xmx"${RUNMAIN_MEM:-16g}" \
  -XX:ReservedCodeCacheSize=1g -Dspark.ui.enabled=false \
  -cp "$CP" "$@"
