#!/usr/bin/env python
"""Horizontally concatenate paired image sequences from two directories
(heights padded to match), e.g. localization plots next to camera
frames.

Reference ``scripts/concat_inference_images.py``: zips
``dir1/*/plot_result_last.png`` (upscaled 2x) with ``dir2/*.png``, pads
the shorter panel with black rows, hconcats, writes to the output dir.
Here the left panel is any glob under dir1.
"""

from __future__ import annotations

import argparse
import glob as globmod
import pathlib
import sys

import numpy as np

SCRIPTS = pathlib.Path(__file__).parent
sys.path.insert(0, str(SCRIPTS.parent))

from f2nerf_tpu.utils.image_io import (read_image, resize_image,  # noqa: E402
                                       write_image)


def pad_to_height(img: np.ndarray, h: int) -> np.ndarray:
    if img.shape[0] >= h:
        return img
    pad = np.zeros((h - img.shape[0],) + img.shape[1:], img.dtype)
    return np.concatenate([img, pad], axis=0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dir1", help="left-panel directory")
    ap.add_argument("dir2", help="right-panel directory (*.png)")
    ap.add_argument("out_dir")
    ap.add_argument("--glob1", default="*/plot_result_last.png",
                    help="glob under dir1 for left panels")
    ap.add_argument("--scale1", type=float, default=2.0,
                    help="upscale factor for left panels")
    args = ap.parse_args()

    lefts = sorted(globmod.glob(str(pathlib.Path(args.dir1) / args.glob1)))
    rights = sorted(pathlib.Path(args.dir2).glob("*.png"))
    if not lefts or not rights:
        raise SystemExit("no input images found")
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    n = min(len(lefts), len(rights))
    for i in range(n):
        left = read_image(lefts[i])
        if args.scale1 != 1.0:
            left = resize_image(left, int(left.shape[0] * args.scale1),
                                int(left.shape[1] * args.scale1))
        right = read_image(rights[i])
        h = max(left.shape[0], right.shape[0])
        merged = np.concatenate(
            [pad_to_height(left, h), pad_to_height(right, h)], axis=1)
        out_path = out_dir / pathlib.Path(rights[i]).name
        write_image(out_path, merged)
        print(f"saved {out_path}")


if __name__ == "__main__":
    main()
