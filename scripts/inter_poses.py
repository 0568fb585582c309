#!/usr/bin/env python
"""Interpolate a smooth camera trajectory between dataset poses.

Reference ``scripts/inter_poses.py:12-40``: slerp on rotations +
linear interpolation on positions between selected key poses, writing
``poses_render.npy`` ([N, 3, 4]) for batch novel-view rendering
(consumed by `python -m f2nerf_tpu.apps.main render`).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
from f2nerf_tpu.localize.localizer import (matrix_to_quat_xyzw,  # noqa: E402
                                           quat_xyzw_to_matrix)


def slerp(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    if np.dot(q0, q1) < 0:
        q1 = -q1
    d = np.clip(np.dot(q0, q1), -1.0, 1.0)
    if d > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(d)
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def interpolate_poses(key_poses: np.ndarray, n_out: int) -> np.ndarray:
    """[K, 3, 4] key poses -> [n_out, 3, 4] interpolated trajectory."""
    k = len(key_poses)
    quats = [matrix_to_quat_xyzw(p[:3, :3].astype(np.float64))
             for p in key_poses]
    out = []
    for i in range(n_out):
        u = i * (k - 1) / max(n_out - 1, 1)
        a = min(int(u), k - 2)
        t = u - a
        q = slerp(quats[a], quats[a + 1], t)
        pose = np.zeros((3, 4), dtype=np.float32)
        pose[:3, :3] = quat_xyzw_to_matrix(q)
        pose[:3, 3] = ((1 - t) * key_poses[a][:3, 3]
                       + t * key_poses[a + 1][:3, 3])
        out.append(pose)
    return np.stack(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True,
                    help="dataset dir with cams_meta.tsv")
    ap.add_argument("--n_out", type=int, default=120)
    ap.add_argument("--key_stride", type=int, default=1,
                    help="use every k-th dataset pose as a key pose")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from f2nerf_tpu.data.dataset import load_dataset
    ds = load_dataset(args.data_dir)
    keys = ds.poses[::args.key_stride]
    traj = interpolate_poses(keys, args.n_out)
    out = args.out or str(pathlib.Path(args.data_dir)
                          / "poses_render.npy")
    np.save(out, traj)
    print(f"wrote {len(traj)} poses to {out}")


if __name__ == "__main__":
    main()
