#!/usr/bin/env bash
# Same-session ALTERNATING-CODE bench control — the standing protocol for
# attributing a perf delta to a code change on this host. Cross-day absolute
# numbers here drift ~15% (BENCH_DELTA.md, round-16 section), so comparing
# this round's bench JSON against last round's artifact measures the host,
# not the code. This script interleaves the two code versions back-to-back
# in one session (A B A B ...), which cancels slow host drift.
#
# Usage:
#   tools/bench_ab.sh <classesA> <classesB> <sfDir> [queries_csv] [rounds]
#
# Build each side first, e.g.:
#   git worktree add /tmp/ab_old <old-ref>
#   (cd /tmp/ab_old && sbt -batch compile)
#   sbt -batch compile                      # current HEAD
#   tools/bench_ab.sh /tmp/ab_old/target/scala-2.13/classes \
#       target/scala-2.13/classes /root/testdata/sf0.1 q1_agg,join_inner 5
#
# Never run anything else graft-heavy while this runs (see README bench notes).
set -e
cd "$(dirname "$0")/.."
A=$1; B=$2; SF=$3; ONLY=${4:-}; ROUNDS=${5:-5}

ERRLOG=${BENCH_AB_ERRLOG:-/tmp/bench_ab_stderr.log}
: > "$ERRLOG"

run_side() { # $1 classes dir -> prints the bench "value" seconds
  # Select the JSON line explicitly (last line starting with '{'): trailing
  # non-JSON stdout (JVM shutdown notices etc.) must not break json.loads.
  # stderr goes to $ERRLOG so a failed side leaves its cause on disk.
  # ONLY is exported only when non-empty: Bench parses an EMPTY
  # SPARK_GRAFT_BENCH_ONLY as the empty query set (a 0-query sweep, value
  # 0.0), not as "all queries" — an empty 4th arg must mean full sweep.
  local out
  out=$(env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_RUNS=1 \
        ${ONLY:+SPARK_GRAFT_BENCH_ONLY="$ONLY"} \
        java $(tools/jvm_opens.sh) -Xmx8g -Dspark.ui.enabled=false \
          -Dspark.sql.session.timeZone=UTC \
          -cp "$1:/opt/spark/jars/*" graft.Bench 2>>"$ERRLOG" \
        | grep '^{' | tail -1)
  python3 -c "import json,sys; print(json.loads(sys.argv[1])['value'])" "$out"
}

VA=(); VB=()
for i in $(seq 1 "$ROUNDS"); do
  a=$(run_side "$A"); b=$(run_side "$B")
  VA+=("$a"); VB+=("$b")
  echo "round $i: A=$a s  B=$b s" >&2
done
python3 - "${VA[*]}" "${VB[*]}" <<'EOF'
import statistics, sys
a = [float(x) for x in sys.argv[1].split()]
b = [float(x) for x in sys.argv[2].split()]
ma, mb = statistics.median(a), statistics.median(b)
print(f"A median {ma:.2f} s   B median {mb:.2f} s   B/A = {mb/ma:.3f}x")
EOF
