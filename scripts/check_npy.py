#!/usr/bin/env python
"""Inspect a cams_meta.npy (or any .npy) file.

Reference ``scripts/check_npy.py``: prints the array shape and the
first camera pose (row 0, columns 0:12 as a 3x4 matrix).
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("npy_path")
    args = ap.parse_args()

    arr = np.load(args.npy_path)
    print(arr.shape)
    np.set_printoptions(precision=6, suppress=True)
    if arr.ndim == 2 and arr.shape[1] >= 12:
        print(arr[0, :12].reshape(3, 4))
    else:
        print(arr)


if __name__ == "__main__":
    main()
