#!/bin/bash
# Round-close sequence (VERDICT r10 wrong #1 / item 2): the driver's
# round-close bench is the gate record, and BENCH_r10 was poisoned by
# concurrent builder sweeps. So the closing order is MECHANICAL:
#
#   1. every heavy sweep runs FIRST, one at a time (standalone wall
#      figures, no cross-contamination);
#   2. the quiet-host perf pins and the builder's own bench
#      median-of-3 run LAST, on an otherwise idle host;
#   3. nothing is left running when the round ends — the driver bench
#      must find an idle host.
#
# Each step logs its wall time to /tmp/close_round.log and the script
# exits nonzero if ANY step fails (same PIPESTATUS discipline as
# soak_roworder.sh).
set -u
LOG=/tmp/close_round.log
: > "$LOG"
rc=0

step() {
  local name="$1"; shift
  echo "=== $name start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) ===" >> "$LOG"
  local t0=$SECONDS
  "$@" >> "$LOG" 2>&1
  local st=$?
  echo "=== $name done rc=$st wall=$((SECONDS - t0))s $(date +%T) ===" >> "$LOG"
  if [ $st -ne 0 ]; then rc=1; fi
}

# 1. Differentials (the driver's own compare, parametrized).
step "diff-sf0.01" env ENGINE_TEST_SF_DIR=/root/testdata/sf0.01 \
  python -m pytest tests/test_differential.py -q
step "diff-sf0.1" env ENGINE_TEST_SF_DIR=/root/testdata/sf0.1 \
  python -m pytest tests/test_differential.py -q

# 2. Row-order invariance, full registry.
step "roworder-sf0.01" env ENGINE_TEST_SF_DIR=/root/testdata/sf0.01 \
  python -m pytest tests/test_row_order.py -q
step "roworder-sf0.1" env ENGINE_TEST_SF_DIR=/root/testdata/sf0.1 \
  python -m pytest tests/test_row_order.py -q

# 3. Composed skew x row-order, WIDE mode (every oracled op).
step "skew-roworder-wide-sf0.01" env \
  ENGINE_TEST_SF_DIR=/root/testdata/sf0.01 ENGINE_SKEW_ROWORDER_ALL=1 \
  python -m pytest tests/test_skew_roworder.py -q
step "skew-roworder-wide-sf0.1" env \
  ENGINE_TEST_SF_DIR=/root/testdata/sf0.1 ENGINE_SKEW_ROWORDER_ALL=1 \
  python -m pytest tests/test_skew_roworder.py -q

# 4. LAST, on the now-idle host: quiet-host perf pins, then the
#    builder bench median-of-3 for the BASELINE record.
step "perf-pins" env ENGINE_PERF_PINS=1 \
  python -m pytest tests/test_perf_pins.py -q
step "bench-median3" env SPARK_GRAFT_BENCH_REPS=3 python bench.py

echo "=== CLOSE DONE rc=$rc $(date +%T) ===" >> "$LOG"
exit $rc
