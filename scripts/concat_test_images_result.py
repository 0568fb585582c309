#!/usr/bin/env python
"""Side-by-side [prediction | ground truth] comparison frames (+movie).

Reference ``scripts/concat_test_images_result.py``: pairs rendered test
images with ground-truth frames, caps each panel at 384x768, stamps a
text label on both, horizontally concatenates, then encodes a movie.

Our ``test`` command already writes [gt | pred | depth] triptychs; this
tool serves the reference's other use — comparing an arbitrary
directory of renders (e.g. ``render`` output) against gt frames.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np
from PIL import Image, ImageDraw

SCRIPTS = pathlib.Path(__file__).parent
sys.path.insert(0, str(SCRIPTS.parent))

from f2nerf_tpu.utils.image_io import read_image, resize_image  # noqa: E402


def labeled_panel(img: np.ndarray, label: str, h: int, w: int) -> Image.Image:
    panel = Image.fromarray(
        np.clip(resize_image(img, h, w) * 255.0 + 0.5, 0, 255)
        .astype(np.uint8))
    draw = ImageDraw.Draw(panel)
    draw.text((10, 10), label, fill=(255, 64, 64))
    return panel


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pred_images_dir")
    ap.add_argument("gt_images_dir")
    ap.add_argument("--prefix", default="",
                    help="only use pred images starting with this prefix")
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--no_movie", action="store_true")
    args = ap.parse_args()

    pred_dir = pathlib.Path(args.pred_images_dir)
    preds = sorted(pred_dir.glob(f"{args.prefix}*.png"))
    gts = sorted(pathlib.Path(args.gt_images_dir).glob("*.png"))
    if not preds:
        raise SystemExit(f"no prediction images in {pred_dir}")
    n = min(len(preds), len(gts))

    save_dir = pred_dir.parent / "test_images_concat"
    save_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        pred = read_image(preds[i])
        gt = read_image(gts[i])
        h = min(pred.shape[0], gt.shape[0], 384)
        w = min(pred.shape[1], gt.shape[1], 768)
        left = labeled_panel(pred, f"NeRF result (frame={i:04d})", h, w)
        right = labeled_panel(gt, f"Ground Truth (frame={i:04d})", h, w)
        out = Image.new("RGB", (2 * w, h))
        out.paste(left, (0, 0))
        out.paste(right, (w, 0))
        out.save(save_dir / f"{i:08d}.png")
        print(f"\r{i + 1}/{n}", end="", flush=True)
    print(f"\nwrote {n} frames to {save_dir}")

    if not args.no_movie:
        from make_movie import encode_movie
        encode_movie(save_dir, fps=args.fps)


if __name__ == "__main__":
    main()
