#!/usr/bin/env python
"""Visualize per-frame particle logs from the localizer service.

Reference ``ros2/python/analyze_particles_log.py``: reads the TSV dumps
written by the node's ``save_particles`` option (header m00..m23,
weight — nerf_based_localizer.cpp:311-329), draws for each frame the
running trajectory plus every particle as an arrow colored/scaled by
its weight, and the weighted mean pose. The reference used gtsam for
the Rot3 log/exp maps in its rotation averaging (Hartley et al.,
"Rotation averaging", IJCV 2013, algorithm 1); here scipy's Rotation
provides the same maps.

Usage: python scripts/analyze_particles_log.py <log_dir> [--out DIR]
where <log_dir> contains 00000000.tsv, 00000001.tsv, ...
(e.g. the --save_particles_dir of f2nerf_tpu.apps.serve).
"""

from __future__ import annotations

import argparse
import pathlib

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from scipy.spatial.transform import Rotation  # noqa: E402

POSE_COLS = [f"m{i}{j}" for i in range(3) for j in range(4)]


def load_particles(path: pathlib.Path) -> tuple[np.ndarray, np.ndarray]:
    """Returns (poses [N,3,4], weights [N])."""
    rows = path.read_text().strip().split("\n")
    header = rows[0].split("\t")
    assert header[:12] == POSE_COLS, f"unexpected header in {path}"
    data = np.array([[float(v) for v in r.split("\t")] for r in rows[1:]])
    return data[:, :12].reshape(-1, 3, 4), data[:, 12]


def rotation_average(rotations: np.ndarray, weights: np.ndarray,
                     epsilon: float = 1e-6, max_iters: int = 300
                     ) -> np.ndarray:
    """Weighted chordal L2 rotation mean by iterating the tangent-space
    update (Hartley IJCV'13 alg. 1, as in the reference tool)."""
    r_cur = rotations[0]
    for _ in range(max_iters):
        rel = np.einsum("ji,njk->nik", r_cur, rotations)  # R^T Ri
        logs = Rotation.from_matrix(rel).as_rotvec()
        step = (weights[:, None] * logs).sum(axis=0)
        if np.linalg.norm(step) < epsilon:
            break
        r_cur = r_cur @ Rotation.from_rotvec(step).as_matrix()
    return r_cur


def plot_frame(poses: np.ndarray, weights: np.ndarray,
               traj: np.ndarray, weight_max: float,
               xlim, ylim, save_path: pathlib.Path) -> None:
    plt.figure(figsize=(6, 6))
    if len(traj):
        plt.plot(traj[:, 2], traj[:, 0], "b")
    w = weights / max(weight_max, 1e-12)
    # arrows: forward axis (-z) scaled by weight, green→red by weight
    for pose, wi in zip(poses, w):
        vec = pose[:3, :3] @ np.array([0.0, 0.0, -0.5]) * wi
        plt.arrow(pose[2, 3], pose[0, 3], vec[2], vec[0],
                  color=(min(wi, 1.0), 1 - min(wi, 1.0), 0),
                  width=0.1 * max(wi, 1e-3))
    wn = weights / max(weights.sum(), 1e-12)
    mean_rot = rotation_average(poses[:, :3, :3], wn)
    mean_pos = (wn[:, None] * poses[:, :3, 3]).sum(axis=0)
    mvec = mean_rot @ np.array([0.0, 0.0, -1.0])
    plt.arrow(mean_pos[2], mean_pos[0], mvec[2], mvec[0],
              color="blue", width=0.05)
    if xlim is not None:
        plt.xlim(xlim)
        plt.ylim(ylim)
    plt.gca().set_aspect("equal")
    plt.xlabel("z")
    plt.ylabel("x")
    plt.savefig(save_path, bbox_inches="tight", pad_inches=0.05, dpi=100)
    plt.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--out", default=None,
                    help="output dir (default <log_dir>/../particles_plot)")
    args = ap.parse_args()
    log_dir = pathlib.Path(args.log_dir)
    out = pathlib.Path(args.out) if args.out else (
        log_dir.parent / "particles_plot")
    out.mkdir(parents=True, exist_ok=True)

    files = sorted(log_dir.glob("*.tsv"))
    if not files:
        raise SystemExit(f"no .tsv logs under {log_dir}")

    frames = [load_particles(f) for f in files]
    weight_max = max(float(w.max()) for _, w in frames)
    means = np.array([
        (w / max(w.sum(), 1e-12) @ p[:, :3, 3]) for p, w in frames])
    pad = 2.0
    xlim = (means[:, 2].min() - pad, means[:, 2].max() + pad)
    ylim = (means[:, 0].min() - pad, means[:, 0].max() + pad)

    for i, (f, (poses, weights)) in enumerate(zip(files, frames)):
        plot_frame(poses, weights, means[: i + 1], weight_max,
                   xlim, ylim, out / f"{f.stem}.png")
        print(f"\r{i + 1}/{len(files)}", end="", flush=True)
    print(f"\nsaved {len(files)} plots to {out}")


if __name__ == "__main__":
    main()
