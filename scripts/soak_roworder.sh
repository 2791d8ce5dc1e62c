#!/bin/bash
# Multi-seed row-order soak at sf0.1 over one soak family (VERDICT r9
# item 2 endpoint; families defined once in tests/conftest.py). One
# pytest session per seed — the shuffled-twin fixture is session-scoped
# and seed-dependent.
#
# Usage: soak_roworder.sh [family] [seed...]
#   family: sumavg (default) or moment
#   seeds : default 8..15
#
# Exit status is the OR of every seed's pytest status (ADVICE r10: the
# old `| tail -2` pipe swallowed failures and always exited 0); each
# seed also appends an explicit PASS/FAIL marker to the log. On a FAIL
# the last 50 lines of that seed's pytest output are kept (ADVICE r11:
# tail -2 discarded the assertion detail, forcing a re-run to diagnose).
set -u
FAMILY="${1:-sumavg}"
shift 2>/dev/null || true
SEEDS=("$@")
if [ ${#SEEDS[@]} -eq 0 ]; then
  SEEDS=(8 9 10 11 12 13 14 15)
fi
LOG=/tmp/soak_roworder.log
: > "$LOG"
OUT=$(mktemp /tmp/soak_roworder.seed.XXXXXX)
trap 'rm -f "$OUT"' EXIT
rc=0
for seed in "${SEEDS[@]}"; do
  echo "=== family $FAMILY seed $seed $(date +%T) ===" >> "$LOG"
  ENGINE_TEST_SF_DIR=/root/testdata/sf0.1 \
  ENGINE_ROWORDER_SEED=$seed \
  ENGINE_ROWORDER_FAMILY="$FAMILY" \
  python -m pytest tests/test_row_order.py -q > "$OUT" 2>&1
  st=$?
  if [ "$st" -eq 0 ]; then
    tail -2 "$OUT" >> "$LOG"
    echo "seed $seed: PASS" >> "$LOG"
  else
    tail -50 "$OUT" >> "$LOG"
    echo "seed $seed: FAIL (pytest exit $st)" >> "$LOG"
    rc=1
  fi
done
echo "=== SOAK DONE rc=$rc $(date +%T) ===" >> "$LOG"
exit $rc
