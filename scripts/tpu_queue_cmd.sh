#!/bin/bash
# Sequence an ARBITRARY TPU command behind a running run_until_done.sh
# (or tpu_queue*) invocation: wait until the given log shows
# DONE/GAVE_UP, then run the command under a SIGTERM-first timeout and
# append DONE/GAVE_UP to its own log so further jobs can chain.
#
# The tunnel is single-client (PLAN.md) so TPU jobs MUST serialize.
#
# Usage: tpu_queue_cmd.sh <wait_log> <own_log> <cmd...>
# Env: WINDOW_S (default 580) per-attempt timeout; ATTEMPTS (default 1)
#   re-invocations (for resumable commands).
set -u
WAIT="$1"; LOG="$2"; shift 2
WINDOW_S=${WINDOW_S:-580}
ATTEMPTS=${ATTEMPTS:-1}
export PYTHONPATH=/root/.axon_site
cd "$(dirname "$0")/.."
while true; do
  if grep -q "^DONE$\|^GAVE_UP$" "$WAIT" 2>/dev/null; then break; fi
  sleep 30
done
for i in $(seq 1 "$ATTEMPTS"); do
  echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout --signal=TERM --kill-after=120 "$WINDOW_S" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== attempt $i exit $rc ===" >> "$LOG"
  if [ "$rc" -eq 0 ]; then echo DONE >> "$LOG"; exit 0; fi
  sleep 2
done
echo "GAVE_UP" >> "$LOG"
exit 1
