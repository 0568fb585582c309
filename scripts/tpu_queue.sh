#!/bin/bash
# Sequence TPU jobs behind a running run_until_done.sh invocation: wait
# until the given log shows DONE/GAVE_UP, then launch the next job.
# The tunnel is single-client (PLAN.md) so jobs MUST serialize.
#
# Usage: tpu_queue.sh <wait_log> <next_log> <quality_run args...>
set -u
WAIT="$1"; LOG="$2"; shift 2
cd "$(dirname "$0")/.."
while true; do
  if grep -q "^DONE$\|^GAVE_UP$" "$WAIT" 2>/dev/null; then break; fi
  sleep 30
done
exec bash scripts/run_until_done.sh "$LOG" "$@"
