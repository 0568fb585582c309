#!/usr/bin/env python
"""Write a COLMAP model_aligner reference trajectory from a pose TSV.

Reference ``scripts/convert_pose_tsv_to_colmap_format.py``: pairs the
sorted ``<dir>/images/*.png`` file names with the (x, y, z) columns of
``pose.tsv`` and writes ``<dir>/reference_trajectory.txt`` lines
``<image_name> <x> <y> <z>`` — the geo-registration input consumed by
``colmap model_aligner`` in local_colmap_and_resize.sh.
"""

from __future__ import annotations

import argparse
import csv
import pathlib


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pose_tsv", help="TSV with x, y, z columns")
    args = ap.parse_args()

    tsv = pathlib.Path(args.pose_tsv)
    target_dir = tsv.parent
    with open(tsv) as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    images = sorted((target_dir / "images").glob("*.png"))
    n = min(len(rows), len(images))
    if n == 0:
        raise SystemExit("no pose rows / images found")

    out = target_dir / "reference_trajectory.txt"
    with open(out, "w") as f:
        for img, row in zip(images[:n], rows[:n]):
            f.write(f"{img.name} {row['x']} {row['y']} {row['z']}\n")
    print(f"wrote {out} ({n} entries)")


if __name__ == "__main__":
    main()
