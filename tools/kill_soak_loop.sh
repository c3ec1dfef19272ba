#!/bin/bash
# Loss-hunting loop for the abrupt-kill soak (the r10 methodology that
# caught the frozen-batch bug, docs/SCALE.md 9b): run the kill soak
# repeatedly under a concurrent Spark-JVM contention load with the WAL
# trace enabled, classify failures, and preserve the artifacts of the
# first COUNT-LOSS failure (trace + sink + checkpoint) for forensics.
#
#   tools/kill_soak_loop.sh [manifest|rename] [iterations]
#
# Artifacts on capture: /tmp/waltrace_fail.log, /tmp/soak_fail.log,
# /tmp/soak_fail_artifacts/.  Per-manifest row forensics: read each
# _manifests/*.json's dir with duckdb and diff payload keys against the
# published set.
set -u
PROTO="${1:-manifest}"
ITERS="${2:-10}"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$ITERS"); do
  timeout 500 python -m pytest tests/test_queries.py -q > /tmp/contend.log 2>&1 &
  CPID=$!
  rm -f /tmp/waltrace.log
  rm -rf /tmp/soak_basetemp
  MQTT_WAL_TRACE=/tmp/waltrace.log timeout 500 python -m pytest \
    "tests/test_soak.py::test_live_soak_abrupt_kills_exactly_once[$PROTO]" \
    -x -q --basetemp=/tmp/soak_basetemp > /tmp/soak_iter.log 2>&1
  rc=$?
  echo "iter $i rc=$rc $(tail -1 /tmp/soak_iter.log)"
  if [ $rc -ne 0 ] && grep -q "count() == n_msgs\|count() == 2" /tmp/soak_iter.log; then
    cp /tmp/waltrace.log /tmp/waltrace_fail.log 2>/dev/null
    cp /tmp/soak_iter.log /tmp/soak_fail.log
    cp -r /tmp/soak_basetemp /tmp/soak_fail_artifacts
    echo "COUNT-LOSS FAILURE CAPTURED iter $i"
    kill $CPID 2>/dev/null
    exit 1
  fi
  kill $CPID 2>/dev/null; wait $CPID 2>/dev/null
done
echo "all $ITERS iterations green"
