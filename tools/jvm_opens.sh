#!/usr/bin/env bash
# Print the --add-opens flags Spark 4 needs on Java 17 (shared by
# run_main.sh and bench_ab.sh).
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
echo "$OPENS"
