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
# Each step logs its wall time to a PER-RUN log (ADVICE r11: a fixed
# name truncated the prior close's record on re-run); /tmp/
# close_round.log is kept as a symlink to the latest run. The bench
# stdout is additionally tee'd to its own dated artifact file so the
# median-of-3 JSON survives independently of the log. The script exits
# nonzero if ANY step fails (same PIPESTATUS discipline as
# soak_roworder.sh) — and a perf-pin SKIP counts as not-measured, not
# success (ADVICE r11): skips are retried after load decays, and a
# never-measured pin fails the close.
set -u
RUN_ID=$(date +%Y%m%d_%H%M%S)
LOG=/tmp/close_round.$RUN_ID.log
: > "$LOG"
ln -sfn "$LOG" /tmp/close_round.log
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
#    The pins SKIP (visibly, by design) when 1-min load is still high —
#    typically right after the sf0.1 skew sweep. A skipped pin means
#    the regression gate never measured, so: retry up to 6 times with a
#    60 s decay wait, and if the last attempt still skips, fail the
#    close rather than closing green unmeasured (ADVICE r11 item 1).
pins_out=/tmp/close_round.$RUN_ID.pins
pin_ok=0
for attempt in 1 2 3 4 5 6; do
  echo "=== perf-pins attempt $attempt start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) ===" >> "$LOG"
  t0=$SECONDS
  env ENGINE_PERF_PINS=1 python -m pytest tests/test_perf_pins.py -q -rs \
    > "$pins_out" 2>&1
  st=$?
  cat "$pins_out" >> "$LOG"
  echo "=== perf-pins attempt $attempt done rc=$st wall=$((SECONDS - t0))s ===" >> "$LOG"
  if [ $st -ne 0 ]; then rc=1; pin_ok=1; break; fi   # a real FAIL: report it
  # Only the BUSY-skip means "pin never measured" — match its specific
  # reason (-rs prints it), not the word "skipped": a future env-gated
  # test skipping for an unrelated reason must not burn the 6 retries
  # and fail a fully-measured close (ADVICE r12).
  if ! grep -q "host busy" "$pins_out"; then pin_ok=1; break; fi
  echo "perf-pins: skipped (host busy) — waiting 60s for load decay" >> "$LOG"
  sleep 60
done
if [ $pin_ok -eq 0 ]; then
  echo "perf-pins: STILL SKIPPED after 6 attempts — pin never measured, failing close" >> "$LOG"
  rc=1
fi

BENCH_OUT=/tmp/close_round.$RUN_ID.bench.json
echo "=== bench-median3 start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) ===" >> "$LOG"
t0=$SECONDS
env SPARK_GRAFT_BENCH_REPS=3 python bench.py 2>> "$LOG" | tee "$BENCH_OUT" >> "$LOG"
st=${PIPESTATUS[0]}
echo "=== bench-median3 done rc=$st wall=$((SECONDS - t0))s (artifact: $BENCH_OUT) ===" >> "$LOG"
if [ $st -ne 0 ]; then rc=1; fi

echo "=== CLOSE DONE rc=$rc $(date +%T) ===" >> "$LOG"
exit $rc
