"""Image IO: PNG <-> float32 HWC arrays in [0, 1].

Reference: ``src/utils.cpp:15-56`` (read_image_tensor / write_image_tensor
via OpenCV, resize via F::interpolate). We use PIL + numpy.
"""

from __future__ import annotations

import pathlib

import numpy as np
from PIL import Image


def read_image(path: str | pathlib.Path) -> np.ndarray:
    """Read an image file -> float32 [H, W, 3] in [0, 1]."""
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


def write_image(path: str | pathlib.Path, image: np.ndarray) -> None:
    """Write float32 [H, W, 3] (or [H, W]) in [0, 1] to a file."""
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def resize_image(image: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear resize float32 [H, W, 3] -> [h, w, 3].

    Reference src/utils.cpp:35-56 (F::interpolate bilinear,
    align_corners=false — PIL BILINEAR matches that convention).
    """
    img = Image.fromarray(
        np.clip(np.asarray(image) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    img = img.resize((w, h), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0
