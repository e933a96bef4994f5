#!/usr/bin/env bash
# Run a graft main against the compiled classes WITHOUT sbt (so long scale
# runs don't hold the project lock). Usage:
#   tools/run_main.sh [-mem 48g] graft.Verify <args...>
# Compile first (sbt -batch compile); this script does not rebuild.
set -e
cd "$(dirname "$0")/.."
MEM=${SPARK_DRIVER_MEM:-8g}
if [ "$1" = "-mem" ]; then MEM=$2; shift 2; fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx$MEM \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
