#!/usr/bin/env python
"""LLFF ``poses_bounds.npy`` -> cams_meta (.npy + .tsv).

Reference ``scripts/llff2poses.py``: LLFF stores [3,5] pose+hwf blocks in
(down, right, back) convention; column swap [:, :, 1:2], -[:, :, 0:1]
converts to the NeRF (right, up, back) convention.
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def convert(data_dir: str | pathlib.Path) -> np.ndarray:
    data_dir = pathlib.Path(data_dir)
    poses_bounds = np.load(data_dir / "poses_bounds.npy").reshape(-1, 17)
    poses_hwf = poses_bounds[:, :15].reshape(-1, 3, 5)
    poses = poses_hwf[:, :3, :4]
    hwf = poses_hwf[:, :3, 4]
    poses = np.concatenate(
        [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], 2)
    bounds = poses_bounds[:, 15:17]
    n = len(poses)
    intr = np.zeros([n, 3, 3])
    intr[:, :3, :3] = np.eye(3)
    intr[:, 0, 0] = hwf[:, 2]
    intr[:, 1, 1] = hwf[:, 2]
    intr[:, 0, 2] = hwf[:, 1] * 0.5
    intr[:, 1, 2] = hwf[:, 0] * 0.5

    data = np.concatenate([
        poses.reshape(n, -1),
        intr.reshape(n, -1),
        np.zeros([n, 4]),
        bounds.reshape(n, -1),
    ], -1).astype(np.float64)

    np.save(data_dir / "cams_meta.npy", np.ascontiguousarray(data))
    header = ("R00\tR01\tR02\ttx\tR10\tR11\tR12\tty\tR20\tR21\tR22\ttz"
              "\tp00\tp01\tp02\tp10\tp11\tp12\tp20\tp21\tp22"
              "\tk1\tk2\tp1\tp2\tbound_near\tbound_far")
    rows = [header] + ["\t".join(f"{v:.9g}" for v in row) for row in data]
    (data_dir / "cams_meta.tsv").write_text("\n".join(rows) + "\n")
    return data


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    args = ap.parse_args()
    data = convert(args.data_dir)
    print(f"wrote cams_meta for {len(data)} images")
