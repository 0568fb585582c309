#!/usr/bin/env python
"""Crop a directory of images (row range), e.g. to remove a vehicle
hood from dashcam frames.

Reference ``scripts/crop_images.py``: reads ``<dir>/images_original``,
keeps rows [0, 850), writes ``<dir>/images``. The row range is
configurable here.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

SCRIPTS = pathlib.Path(__file__).parent
sys.path.insert(0, str(SCRIPTS.parent))

from f2nerf_tpu.utils.image_io import read_image, write_image  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("target_dir",
                    help="directory containing images_original/")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--bottom", type=int, default=850,
                    help="first excluded row (reference crops to 850)")
    args = ap.parse_args()

    target = pathlib.Path(args.target_dir)
    in_dir = target / "images_original"
    out_dir = target / "images"
    out_dir.mkdir(parents=True, exist_ok=True)

    paths = sorted(in_dir.glob("*.png"))
    if not paths:
        raise SystemExit(f"no .png images in {in_dir}")
    for k, p in enumerate(paths):
        img = read_image(p)
        write_image(out_dir / p.name, img[args.top:args.bottom])
        print(f"\r{k + 1}/{len(paths)}", end="", flush=True)
    print(f"\nwrote {len(paths)} images to {out_dir}")


if __name__ == "__main__":
    main()
