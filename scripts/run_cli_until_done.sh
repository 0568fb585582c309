#!/bin/bash
# Loop the CLI trainer (python -m f2nerf_tpu.apps.main train) in <=580 s
# TPU-safe windows until "Train done" (rc 0) — the cams_meta-pipeline
# counterpart of run_until_done.sh (cmd_train SIGTERM-checkpoints and
# resumes, apps/main.py). Optionally runs `test` afterwards.
#
# Usage: run_cli_until_done.sh <logfile> <result_dir> <dataset_dir> [test_dataset_dir]
set -u
export PYTHONPATH=/root/.axon_site
LOG="$1"; RD="$2"; DS="$3"; TESTDS="${4:-}"
MAX_WINDOWS=${MAX_WINDOWS:-80}
WINDOW_S=${WINDOW_S:-580}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compilation_cache
for i in $(seq 1 "$MAX_WINDOWS"); do
  echo "=== window $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout --signal=TERM --kill-after=180 "$WINDOW_S" \
    python -m f2nerf_tpu.apps.main train "$RD" "$DS" >> "$LOG" 2>&1
  rc=$?
  echo "=== window $i exit $rc ===" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    if [ -n "$TESTDS" ]; then
      timeout --signal=TERM --kill-after=120 580 \
        python -m f2nerf_tpu.apps.main test "$RD" "$TESTDS" >> "$LOG" 2>&1
      test_rc=$?
      if [ "$test_rc" -ne 0 ]; then
        # propagate: callers (tpu_queue) must not treat a failed or
        # timed-out test phase as a completed job (ADVICE r2)
        echo "TEST_FAILED rc=$test_rc" >> "$LOG"; exit "$test_rc"
      fi
    fi
    echo DONE >> "$LOG"; exit 0
  fi
  sleep 2
done
echo "GAVE_UP" >> "$LOG"
exit 1
