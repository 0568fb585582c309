#!/usr/bin/env python
"""Plot the camera trajectory stored in cams_meta.npy, one frame per
camera (trajectory-so-far + current heading arrows), suitable for
make_movie.py.

Reference ``scripts/plot_camera_meta.py``: z on the x-axis, x on the
(flipped) y-axis, heading arrows built from the camera's -z axis.
"""

from __future__ import annotations

import argparse
import pathlib

import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cams_meta_npy")
    ap.add_argument("--stride", type=int, default=1,
                    help="plot every Nth camera")
    args = ap.parse_args()

    meta = np.load(args.cams_meta_npy)
    print(meta.shape)
    poses = meta[:, :12].reshape(-1, 3, 4).astype(np.float64).copy()
    poses[:, :, 3] -= poses[0, :, 3]
    pos = poses[:, :, 3]

    save_dir = pathlib.Path(args.cams_meta_npy).parent / "camera_pose"
    save_dir.mkdir(parents=True, exist_ok=True)

    # heading probes in camera frame (camera looks along -z)
    probe_l = np.array([-0.25, 0.0, -1.0])
    probe_r = np.array([+0.25, 0.0, -1.0])

    idx = range(0, len(poses), args.stride)
    for k, i in enumerate(idx):
        rot, t = poses[i, :, :3], poses[i, :, 3]
        fl = rot @ probe_l + t
        fr = rot @ probe_r + t
        plt.plot(pos[:i + 1, 2], pos[:i + 1, 0])
        for tip in (fl, fr):
            plt.arrow(t[2], t[0], tip[2] - t[2], tip[0] - t[0],
                      width=0.1, color="red")
        plt.axis("equal")
        plt.ylim(plt.ylim()[::-1])
        plt.xlabel("z")
        plt.ylabel("x")
        plt.savefig(save_dir / f"{k:08d}.png",
                    bbox_inches="tight", pad_inches=0.05)
        plt.close()
        print(f"\r{k + 1}/{len(list(idx))}", end="", flush=True)
    print(f"\nwrote plots to {save_dir}")


if __name__ == "__main__":
    main()
