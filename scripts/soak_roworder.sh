#!/bin/bash
# r10 closing: 8-seed row-order soak at sf0.1 over the SUM/AVG oracle
# family (VERDICT r9 item 2 endpoint). One pytest session per seed —
# the shuffled-twin fixture is session-scoped and seed-dependent.
set -u
LOG=/tmp/soak_roworder.log
: > "$LOG"
for seed in 8 9 10 11 12 13 14 15; do
  echo "=== seed $seed $(date +%T) ===" >> "$LOG"
  ENGINE_TEST_SF_DIR=/root/testdata/sf0.1 \
  ENGINE_ROWORDER_SEED=$seed \
  ENGINE_ROWORDER_FAMILY=sumavg \
  python -m pytest tests/test_row_order.py -q 2>&1 | tail -2 >> "$LOG"
done
echo "=== SOAK DONE $(date +%T) ===" >> "$LOG"
