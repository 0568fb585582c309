#!/usr/bin/env python
"""COLMAP sparse model -> cams_meta for f2nerf_tpu.

Re-implements the reference ``scripts/colmap2poses.py`` (MipNeRF360-
derived loader) with the same conventions:

* camera-to-world poses from inverted COLMAP world-to-camera,
* axis chain COLMAP (right, down, fwd) -> World (fwd, left, up) ->
  NeRF (right, up, back) (reference :70-79),
* images sorted by name,
* per-image near/far from the 1%/99% depth percentiles of the SfM
  points visible in that image, scaled x0.5 / x5 (reference :159-170),
* exports ``cams_meta.npy`` (27 cols, like the reference) and
  ``cams_meta.tsv`` (the on-disk format the Dataset loader reads).

Usage: colmap2poses.py --data_dir <dir> [--model_subdir sparse/0]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from colmap_reader import load_model  # noqa: E402

# World (x fwd, y left, z up) -> NeRF (x right, y up, z back); reference
# scripts/convert_pose_tsv_to_f2_format.py:25-30
AXIS_CONVERT_MAT_W2N = np.array(
    [[0, -1, 0, 0],
     [0, 0, 1, 0],
     [-1, 0, 0, 0],
     [0, 0, 0, 1]], dtype=np.float64)

# COLMAP camera (right, down, fwd) -> World (fwd, left, up); reference
# scripts/colmap2poses.py:71-75
COLMAP_TO_WORLD = np.array(
    [[0, 0, 1, 0],
     [-1, 0, 0, 0],
     [0, -1, 0, 0],
     [0, 0, 0, 1]], dtype=np.float64)


def convert(data_dir: str, model_subdir: str = "pose_aligned",
            fallback_subdirs: tuple[str, ...] = ("sparse/0", "sparse"),
            out_tsv: bool = True) -> np.ndarray:
    data_dir = pathlib.Path(data_dir)
    model_dir = None
    for sub in (model_subdir, *fallback_subdirs):
        if (data_dir / sub / "cameras.bin").exists() or \
                (data_dir / sub / "cameras.txt").exists():
            model_dir = data_dir / sub
            break
    if model_dir is None:
        raise FileNotFoundError(
            f"no COLMAP model under {data_dir} "
            f"(tried {model_subdir}, {fallback_subdirs})")
    model = load_model(model_dir)

    # shared intrinsics (reference assumes one camera)
    cam = next(iter(model.cameras.values()))
    k = cam.k
    dist = cam.dist

    ids = list(model.images.keys())
    names = [model.images[i].name for i in ids]
    order = np.argsort(names)
    ids = [ids[i] for i in order]

    poses = []
    for iid in ids:
        c2w = np.linalg.inv(model.images[iid].w2c())
        c2w = c2w @ COLMAP_TO_WORLD.T
        c2w = AXIS_CONVERT_MAT_W2N @ c2w @ AXIS_CONVERT_MAT_W2N.T
        poses.append(c2w[:3, :4])
    poses = np.stack(poses)

    # near/far from visible-point depth percentiles
    n = len(ids)
    id_to_idx = {iid: i for i, iid in enumerate(ids)}
    depth_lists: list[list[float]] = [[] for _ in range(n)]
    for p, vis in zip(model.points, model.point_image_ids):
        # transform point through the same axis chain as the poses
        pw = AXIS_CONVERT_MAT_W2N[:3, :3] @ p
        for iid in vis:
            i = id_to_idx.get(iid)
            if i is None:
                continue
            c2w = np.eye(4)
            c2w[:3, :4] = poses[i]
            w2c = np.linalg.inv(c2w)
            z = w2c[2, :3] @ pw + w2c[2, 3]
            depth_lists[i].append(-z)

    bounds = np.zeros((n, 2))
    for i in range(n):
        d = np.array(depth_lists[i]) if depth_lists[i] else np.array([1.0])
        d = d[d > 0] if (d > 0).any() else np.array([1.0])
        near, far = np.percentile(d, 1.0), np.percentile(d, 99.0)
        bounds[i] = [near * 0.5, far * 5.0]

    data = np.concatenate([
        poses.reshape(n, -1),
        np.tile(k.reshape(1, 9), (n, 1)),
        np.tile(dist.reshape(1, 4), (n, 1)),
        bounds,
    ], axis=-1).astype(np.float64)

    np.save(data_dir / "cams_meta.npy", np.ascontiguousarray(data))
    if out_tsv:
        header = ("R00\tR01\tR02\ttx\tR10\tR11\tR12\tty\tR20\tR21\tR22\ttz"
                  "\tp00\tp01\tp02\tp10\tp11\tp12\tp20\tp21\tp22"
                  "\tk1\tk2\tp1\tp2\tbound_near\tbound_far")
        rows = [header] + ["\t".join(f"{v:.9g}" for v in row)
                           for row in data]
        (data_dir / "cams_meta.tsv").write_text("\n".join(rows) + "\n")
    return data


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--model_subdir", default="pose_aligned")
    args = ap.parse_args()
    data = convert(args.data_dir, args.model_subdir)
    print(f"wrote cams_meta for {len(data)} images")


if __name__ == "__main__":
    main()
