#!/usr/bin/env python
"""Render a procedural scene to an on-disk cams_meta dataset dir
(reference format: cams_meta.tsv + images/*.png), optionally splitting
held-out views into a sibling dir — so quality runs can exercise the
full CLI pipeline (dataset dir -> apps.main train/test -> eval.py)
end-to-end, the way a real COLMAP-prepared capture would flow.

Example (VERDICT round-1 #9: larger textured scene at full capacity):
  python scripts/make_synthetic_dataset.py /tmp/ds_checker400 \
      --scene checker --n_images 18 --hw 400 --holdout 8
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", type=pathlib.Path)
    ap.add_argument("--scene", choices=("checker", "sphere", "corridor", "textured", "longtraj", "objcap"),
                    default="checker")
    ap.add_argument("--n_images", type=int, default=18)
    ap.add_argument("--hw", type=int, default=400)
    ap.add_argument("--holdout", type=int, default=0,
                    help="withhold every k-th view into <out_dir>_holdout")
    args = ap.parse_args()

    from f2nerf_tpu.data.dataset import save_dataset
    from f2nerf_tpu.data.synthetic import (make_checker_dataset,
                                           make_corridor_dataset,
                                           make_longtraj_dataset,
                                           make_objcap_dataset,
                                           make_sphere_dataset,
                                           make_textured_dataset)

    make = {"checker": make_checker_dataset,
            "sphere": make_sphere_dataset,
            "corridor": make_corridor_dataset,
            "textured": make_textured_dataset,
            "longtraj": make_longtraj_dataset,
            "objcap": make_objcap_dataset}[args.scene]
    ds = make(n_images=args.n_images, h=args.hw, w=args.hw)

    if args.holdout > 0:
        held = list(range(0, ds.n_images, args.holdout))
        keep = [i for i in range(ds.n_images) if i not in held]

        def subset(idx):
            return dataclasses.replace(
                ds, poses=ds.poses[idx], intrinsics=ds.intrinsics[idx],
                dist_params=ds.dist_params[idx], bounds=ds.bounds[idx],
                images=ds.images[idx])

        save_dataset(subset(keep), args.out_dir)
        hold_dir = args.out_dir.parent / (args.out_dir.name + "_holdout")
        save_dataset(subset(held), hold_dir)
        print(f"{len(keep)} train views -> {args.out_dir}; "
              f"{len(held)} held-out -> {hold_dir}")
    else:
        save_dataset(ds, args.out_dir)
        print(f"{ds.n_images} views -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
