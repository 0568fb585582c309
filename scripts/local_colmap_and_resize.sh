#!/usr/bin/env bash
# COLMAP SfM pipeline -> cams_meta for f2nerf_tpu.
# Reference scripts/local_colmap_and_resize.sh:33-62:
#   feature_extractor -> exhaustive_matcher -> mapper ->
#   (optional) model_aligner to a reference trajectory -> colmap2poses.
# Requires the `colmap` binary on PATH.
set -euo pipefail

DATA_DIR=${1:?usage: local_colmap_and_resize.sh <data_dir> [ref_traj.txt]}
REF_TRAJ=${2:-}

colmap feature_extractor \
  --database_path "$DATA_DIR/database.db" \
  --image_path "$DATA_DIR/images" \
  --ImageReader.single_camera 1 \
  --ImageReader.camera_model OPENCV

colmap exhaustive_matcher --database_path "$DATA_DIR/database.db"

mkdir -p "$DATA_DIR/sparse"
colmap mapper \
  --database_path "$DATA_DIR/database.db" \
  --image_path "$DATA_DIR/images" \
  --output_path "$DATA_DIR/sparse"

MODEL_DIR="$DATA_DIR/sparse/0"
if [[ -n "$REF_TRAJ" ]]; then
  mkdir -p "$DATA_DIR/pose_aligned"
  colmap model_aligner \
    --input_path "$MODEL_DIR" \
    --output_path "$DATA_DIR/pose_aligned" \
    --ref_images_path "$REF_TRAJ" \
    --robust_alignment 1 \
    --robust_alignment_max_error 0.1
  MODEL_SUBDIR=pose_aligned
else
  MODEL_SUBDIR=sparse/0
fi

python "$(dirname "$0")/colmap2poses.py" \
  --data_dir "$DATA_DIR" --model_subdir "$MODEL_SUBDIR"
echo "done: $DATA_DIR/cams_meta.tsv"
