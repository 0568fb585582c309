#!/usr/bin/env python
"""Compose rendered frames into a movie.

Reference movie-maker scripts equivalent. Uses ffmpeg when present
(mp4), otherwise falls back to an animated GIF via PIL.
"""

from __future__ import annotations

import argparse
import glob
import pathlib
import shutil
import subprocess


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("frames_dir", help="directory of *.png frames")
    ap.add_argument("--out", default=None,
                    help="output path (.mp4 with ffmpeg, else .gif)")
    ap.add_argument("--fps", type=int, default=30)
    args = ap.parse_args()

    frames = sorted(glob.glob(str(pathlib.Path(args.frames_dir) / "*.png")))
    if not frames:
        raise SystemExit(f"no frames in {args.frames_dir}")

    if shutil.which("ffmpeg"):
        out = args.out or str(pathlib.Path(args.frames_dir) / "movie.mp4")
        subprocess.run([
            "ffmpeg", "-y", "-framerate", str(args.fps), "-pattern_type",
            "glob", "-i", str(pathlib.Path(args.frames_dir) / "*.png"),
            "-pix_fmt", "yuv420p", out], check=True)
    else:
        from PIL import Image
        out = args.out or str(pathlib.Path(args.frames_dir) / "movie.gif")
        imgs = [Image.open(f) for f in frames]
        imgs[0].save(out, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / args.fps), loop=0)
    print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
