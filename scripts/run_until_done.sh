#!/bin/bash
# Loop a resumable quality_run invocation in <=590 s TPU-safe windows
# (PLAN.md environment notes: SIGTERM-checkpoint, never SIGKILL a busy
# tunnel client) until it reports done (rc 0) or MAX_WINDOWS is hit.
#
# Usage: run_until_done.sh <logfile> <quality_run args...>
set -u
export PYTHONPATH=/root/.axon_site
LOG="$1"; shift
MAX_WINDOWS=${MAX_WINDOWS:-80}
WINDOW_S=${WINDOW_S:-580}
BUDGET_S=${BUDGET_S:-540}
cd "$(dirname "$0")/.."
for i in $(seq 1 "$MAX_WINDOWS"); do
  echo "=== window $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout --signal=TERM --kill-after=120 "$WINDOW_S" \
    python scripts/quality_run.py "$@" --budget_s "$BUDGET_S" >> "$LOG" 2>&1
  rc=$?
  echo "=== window $i exit $rc ===" >> "$LOG"
  if [ "$rc" -eq 0 ]; then echo DONE >> "$LOG"; exit 0; fi
  sleep 2
done
echo "GAVE_UP" >> "$LOG"
exit 1
