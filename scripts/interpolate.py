#!/usr/bin/env python
"""Timestamp-aligned pose interpolation.

Reference ``scripts/interpolate.py``: given a pose TSV
(timestamp, x, y, z, qx, qy, qz, qw) and a list of query timestamps,
produce interpolated poses (slerp rotation + lerp translation) at the
query times — used to align camera frames with a pose stream.
"""

from __future__ import annotations

import argparse
import csv
import pathlib
import sys

import numpy as np


def slerp_quat(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    if np.dot(q0, q1) < 0:
        q1 = -q1
    d = np.clip(np.dot(q0, q1), -1.0, 1.0)
    if d > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(d)
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def load_pose_tsv(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ts, xyz, quat = [], [], []
    with open(path) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            ts.append(float(row["timestamp"]))
            xyz.append([float(row["x"]), float(row["y"]),
                        float(row["z"])])
            quat.append([float(row["qx"]), float(row["qy"]),
                         float(row["qz"]), float(row["qw"])])
    order = np.argsort(ts)
    return (np.array(ts)[order], np.array(xyz)[order],
            np.array(quat)[order])


def interpolate_at(ts: np.ndarray, xyz: np.ndarray, quat: np.ndarray,
                   queries: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Returns (xyz_q [Q, 3], quat_q [Q, 4]); queries clamped to range."""
    out_x, out_q = [], []
    for t in queries:
        t = float(np.clip(t, ts[0], ts[-1]))
        i = int(np.searchsorted(ts, t, side="right") - 1)
        i = min(max(i, 0), len(ts) - 2)
        denom = max(ts[i + 1] - ts[i], 1e-12)
        a = (t - ts[i]) / denom
        out_x.append((1 - a) * xyz[i] + a * xyz[i + 1])
        out_q.append(slerp_quat(quat[i], quat[i + 1], a))
    return np.stack(out_x), np.stack(out_q)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pose_tsv")
    ap.add_argument("timestamps", help="file with one query timestamp "
                                       "per line")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    ts, xyz, quat = load_pose_tsv(args.pose_tsv)
    queries = np.array([float(x) for x in
                        pathlib.Path(args.timestamps).read_text().split()])
    xq, qq = interpolate_at(ts, xyz, quat, queries)
    out = args.out or (str(pathlib.Path(args.pose_tsv).with_suffix(""))
                       + "_interp.tsv")
    with open(out, "w") as f:
        f.write("timestamp\tx\ty\tz\tqx\tqy\tqz\tqw\n")
        for t, x, q in zip(queries, xq, qq):
            f.write(f"{t:.9f}\t" + "\t".join(f"{v:.9f}" for v in x)
                    + "\t" + "\t".join(f"{v:.9f}" for v in q) + "\n")
    print(f"wrote {len(queries)} poses to {out}")


if __name__ == "__main__":
    main()
