#!/usr/bin/env python
"""Timestamped pose TSV + camera_info.yaml -> cams_meta.tsv.

Reference ``scripts/convert_pose_tsv_to_f2_format.py``: converts a
(timestamp, x, y, z, qx, qy, qz, qw) TSV (e.g. from a rosbag) and the
ROS camera_info intrinsics into the 27-column cams_meta.tsv, applying
the world->NeRF axis conversion and fixed [1, 30] bounds.
"""

from __future__ import annotations

import argparse
import csv
import pathlib

import numpy as np
import yaml

AXIS_CONVERT_MAT_W2N = np.array(
    [[0, -1, 0, 0],
     [0, 0, 1, 0],
     [-1, 0, 0, 0],
     [0, 0, 0, 1]], dtype=np.float64)


def quat_xyzw_to_matrix(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def load_camera_info(path: str | pathlib.Path) -> dict:
    with open(path) as f:
        info = yaml.safe_load(f)
    info["D"] = np.array(info["D"], dtype=np.float64)
    info["K"] = np.array(info["K"], dtype=np.float64).reshape(3, 3)
    return info


def convert(path_to_pose_tsv: str) -> np.ndarray:
    path = pathlib.Path(path_to_pose_tsv)
    target_dir = path.parent

    rows = []
    with open(path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            rows.append([float(row[k])
                         for k in ("x", "y", "z", "qx", "qy", "qz", "qw")])
    arr = np.array(rows)
    n = len(arr)

    mats = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        mats[i, :3, :3] = quat_xyzw_to_matrix(arr[i, 3:7])
        mats[i, :3, 3] = arr[i, 0:3]
    mats = AXIS_CONVERT_MAT_W2N @ mats @ AXIS_CONVERT_MAT_W2N.T
    poses = mats[:, :3, :].reshape(n, 12)

    info = load_camera_info(target_dir / "camera_info.yaml")
    k = np.tile(info["K"].reshape(1, 9), (n, 1))
    dist = np.tile(info["D"][:4].reshape(1, 4), (n, 1))
    bounds = np.tile(np.array([[1.0, 30.0]]), (n, 1))

    data = np.concatenate([poses, k, dist, bounds], axis=1)
    header = ("R00\tR01\tR02\ttx\tR10\tR11\tR12\tty\tR20\tR21\tR22\ttz"
              "\tp00\tp01\tp02\tp10\tp11\tp12\tp20\tp21\tp22"
              "\tk1\tk2\tp1\tp2\tbound_near\tbound_far")
    out = [header] + ["\t".join(f"{v:.9g}" for v in row) for row in data]
    (target_dir / "cams_meta.tsv").write_text("\n".join(out) + "\n")
    return data


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("path_to_pose_tsv")
    args = ap.parse_args()
    data = convert(args.path_to_pose_tsv)
    print(f"wrote cams_meta.tsv for {len(data)} poses")
