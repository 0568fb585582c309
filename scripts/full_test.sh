#!/bin/bash
# End-to-end regression: train then test on a dataset.
# Reference scripts/full_test.sh (build_and_exec_training.sh +
# build_and_exec_test.sh) — no build step needed here; the config in
# <result_dir>/train_config.yaml (if present) describes the run, like
# the reference's copy-config-into-result-dir convention.
set -eux

TRAIN_RESULT_DIR=$(readlink -f "$1")
DATASET_PATH=$(readlink -f "$2")
cd "$(dirname "$0")/.."

python -m f2nerf_tpu.apps.main train "${TRAIN_RESULT_DIR}" "${DATASET_PATH}"
python -m f2nerf_tpu.apps.main test "${TRAIN_RESULT_DIR}" "${DATASET_PATH}"
