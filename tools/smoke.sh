#!/usr/bin/env bash
# Full local gate in one command (~3 min): compile, tests, oracle verify at
# two scale factors, bench. Mirrors what the driver runs per round.
set -e
cd "$(dirname "$0")/.."
sbt -batch compile test
for sf in sf0.01 sf0.001; do
  out="/tmp/graft_verify_$sf"
  rm -rf "$out"
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out"
  python3 tools/check.py "/root/testdata/$sf" "$out"
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$(nproc)" sbt -batch "runMain graft.Bench"
python3 -c "import json; d=json.load(open('bench_out.json')); print('bench total', round(d['value'],2), 's for', len(d['queries']), 'queries')"
