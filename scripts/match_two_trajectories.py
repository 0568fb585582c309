#!/usr/bin/env python
"""Align one trajectory to another (similarity transform, Umeyama).

Reference ``scripts/match_two_trajectories.py``: estimates the
rotation/translation/scale mapping trajectory B onto trajectory A and
reports residuals — used to compare localizer outputs against ground
truth. Input: two TSVs with x, y, z columns (tab-separated, header).
"""

from __future__ import annotations

import argparse
import csv

import numpy as np


def load_xyz(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            rows.append([float(row["x"]), float(row["y"]),
                         float(row["z"])])
    return np.array(rows)


def umeyama(src: np.ndarray, dst: np.ndarray,
            with_scale: bool = True) -> tuple[np.ndarray, np.ndarray,
                                              float]:
    """Least-squares similarity transform: dst ~ s * R @ src + t."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    u, d, vt = np.linalg.svd(cov)
    s_fix = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s_fix[2, 2] = -1
    r = u @ s_fix @ vt
    var = (sc ** 2).sum() / len(src)
    scale = float(np.trace(np.diag(d) @ s_fix) / var) if with_scale \
        else 1.0
    t = mu_d - scale * r @ mu_s
    return r, t, scale


def align(src: np.ndarray, dst: np.ndarray,
          with_scale: bool = True) -> dict:
    n = min(len(src), len(dst))
    r, t, s = umeyama(src[:n], dst[:n], with_scale)
    mapped = s * src[:n] @ r.T + t
    err = np.linalg.norm(mapped - dst[:n], axis=-1)
    return {"rotation": r, "translation": t, "scale": s,
            "rmse": float(np.sqrt((err ** 2).mean())),
            "mean_error": float(err.mean()),
            "max_error": float(err.max()), "n": n}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("traj_a", help="reference trajectory TSV (x, y, z)")
    ap.add_argument("traj_b", help="trajectory to align")
    ap.add_argument("--no-scale", action="store_true")
    args = ap.parse_args()
    out = align(load_xyz(args.traj_b), load_xyz(args.traj_a),
                with_scale=not args.no_scale)
    print(f"n={out['n']} scale={out['scale']:.6f} "
          f"rmse={out['rmse']:.6f} mean={out['mean_error']:.6f} "
          f"max={out['max_error']:.6f}")


if __name__ == "__main__":
    main()
