#!/usr/bin/env python
"""Undistort (rectify) a directory of images using camera_info.yaml.

Reference ``scripts/rectify_images.py`` (cv2.undistort); here the LUT
is built once with ``f2nerf_tpu.utils.undistort`` (the my_image_proc
UndistortNode remap approach) and reused for every frame.

Layout matches the reference: ``<dir>/images_original`` +
``<dir>/camera_info.yaml`` -> ``<dir>/images``.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np
import yaml

SCRIPTS = pathlib.Path(__file__).parent
sys.path.insert(0, str(SCRIPTS.parent))

from f2nerf_tpu.utils.image_io import read_image, write_image  # noqa: E402
from f2nerf_tpu.utils.undistort import (build_undistort_map,  # noqa: E402
                                        remap_bilinear)


def load_camera_info(path: pathlib.Path) -> tuple[np.ndarray, np.ndarray]:
    """Accepts both camera_info conventions: the sensor_msgs dump the
    reference uses (K/D lists, util_camera_info.py) and the ROS
    calibration-file format our rosbag extractor writes
    (camera_matrix/distortion_coefficients with nested data)."""
    with open(path) as f:
        info = yaml.safe_load(f)
    if "K" in info:
        k, d = info["K"], info["D"]
    else:
        k = info["camera_matrix"]["data"]
        d = info["distortion_coefficients"]["data"]
    return (np.asarray(k, dtype=np.float64).reshape(3, 3),
            np.asarray(d, dtype=np.float64))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("target_dir",
                    help="dir with images_original/ and camera_info.yaml")
    args = ap.parse_args()

    target = pathlib.Path(args.target_dir)
    intrinsic, dist = load_camera_info(target / "camera_info.yaml")
    if dist.size < 4:
        dist = np.pad(dist, (0, 4 - dist.size))

    out_dir = target / "images"
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = sorted((target / "images_original").glob("*.png"))
    if not paths:
        raise SystemExit(f"no .png images in {target / 'images_original'}")

    maps = None
    for k, p in enumerate(paths):
        img = read_image(p)
        if maps is None:
            maps = build_undistort_map(intrinsic, dist,
                                       img.shape[0], img.shape[1])
        write_image(out_dir / p.name, remap_bilinear(img, *maps))
        print(f"\r{k + 1}/{len(paths)}", end="", flush=True)
    print(f"\nwrote {len(paths)} images to {out_dir}")


if __name__ == "__main__":
    main()
