#!/usr/bin/env python
"""Movie of one pose-recovery run: images + live score plot.

Reference ``scripts/make_movie_inference.py``: for an inference result
dir it annotates (1) GT, (2) NeRF @ GT pose, (3) NeRF @ noised pose,
(4) NeRF @ optimized pose at each iteration, stacks them 2x2 above a
score-vs-iteration plot with a cursor, writes
``image_05_concat_*.png`` frames and an mp4.

Ours operates on the per-image dirs our ``infer`` CLI writes
(inference_result/<idx>/image_01_gt.png, image_02_before.png,
image_03_noised<d>.png, image_04_after_<d>_<itr>.png, position.tsv) —
pick the perturbation direction with --direction.

Usage:
  python scripts/make_movie_inference.py <result_dir/inference_result/0000> \
      [--direction 0] [--fps 5]
"""

from __future__ import annotations

import argparse
import pathlib
import shutil
import subprocess

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image, ImageDraw  # noqa: E402


def put_text(img: Image.Image, text: str) -> Image.Image:
    draw = ImageDraw.Draw(img)
    # outline then fill, like the reference's double cv2.putText
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            draw.text((5 + dx, 5 + dy), text, fill=(0, 0, 0))
    draw.text((5, 5), text, fill=(255, 0, 0))
    return img


def load_scores(result_dir: pathlib.Path, direction: int) -> list[float]:
    rows = (result_dir / "position.tsv").read_text().strip().split("\n")[1:]
    scores = []
    for row in rows:
        name, *_, score = row.split("\t")
        if name.startswith(f"optimized_{direction}_"):
            scores.append(float(score))
    return scores


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("result_dir",
                    help="one per-image dir under inference_result/")
    ap.add_argument("--direction", type=int, default=0)
    ap.add_argument("--fps", type=int, default=5)
    args = ap.parse_args()
    rd = pathlib.Path(args.result_dir)
    d = args.direction

    image_gt = put_text(Image.open(rd / "image_01_gt.png").convert("RGB"),
                        "(1) GT Image")
    image_before = put_text(
        Image.open(rd / "image_02_before.png").convert("RGB"),
        "(2) NeRF @ GT Pose")
    image_noised = put_text(
        Image.open(rd / f"image_03_noised{d}.png").convert("RGB"),
        "(3) NeRF @ Noised Pose")
    after_paths = sorted(rd.glob(f"image_04_after_{d}_*.png"))
    if not after_paths:
        raise SystemExit(f"no image_04_after_{d}_* frames in {rd}")
    scores = load_scores(rd, d)

    w, h = image_gt.size
    for i, path in enumerate(after_paths):
        image_after = put_text(Image.open(path).convert("RGB"),
                               f"(4) NeRF @ Optimized Pose {i:02d}")
        plt.figure(figsize=(8, 1.5))
        plt.plot(range(len(scores)), scores)
        plt.axvline(x=i, color="r", linestyle="--")
        plt.xlabel("iteration")
        plt.ylabel("score")
        plot_path = rd / "score_plot.png"
        plt.savefig(plot_path, bbox_inches="tight", pad_inches=0.05)
        plt.close()
        plot_image = Image.open(plot_path).convert("RGB")
        plot_h = int(plot_image.height * (2 * w) / plot_image.width) // 2 * 2
        plot_image = plot_image.resize((2 * w, plot_h))

        canvas = Image.new("RGB", (2 * w, 2 * h + plot_h))
        canvas.paste(image_gt, (0, 0))
        canvas.paste(image_before, (w, 0))
        canvas.paste(image_noised, (0, h))
        canvas.paste(image_after, (w, h))
        canvas.paste(plot_image, (0, 2 * h))
        canvas.save(rd / f"image_05_concat_{i:04d}.png")

    if shutil.which("ffmpeg"):
        subprocess.run(
            ["ffmpeg", "-y", "-r", str(args.fps), "-f", "image2", "-i",
             "image_05_concat_%04d.png", "-vcodec", "libx264", "-pix_fmt",
             "yuv420p", "../concat_movie.mp4"], cwd=rd, check=True)
        print(f"wrote {rd.parent / 'concat_movie.mp4'}")
    else:
        frames = [Image.open(p) for p in sorted(
            rd.glob("image_05_concat_*.png"))]
        out = rd.parent / "concat_movie.gif"
        frames[0].save(out, save_all=True, append_images=frames[1:],
                       duration=int(1000 / args.fps), loop=0)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
