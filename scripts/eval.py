#!/usr/bin/env python
"""Offline eval: PSNR / SSIM (/ LPIPS when weights are available) over
paired gt/pred image directories -> info.json.

Reference ``scripts/eval.py:78-117``. LPIPS needs pretrained VGG weights
(network access); it is skipped gracefully when unavailable.
"""

from __future__ import annotations

import argparse
import glob
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
from f2nerf_tpu.utils.image_io import read_image  # noqa: E402
from f2nerf_tpu.utils.metrics import psnr, ssim  # noqa: E402


def try_lpips(weights: str | None = None):
    """Prefer the self-contained torch LPIPS (local weight file via
    --lpips_weights / LPIPS_WEIGHTS / weights/lpips_vgg.pt —
    f2nerf_tpu/utils/lpips.py); fall back to the lpips pip package if
    one is installed. Returns None when neither is available."""
    try:
        from f2nerf_tpu.utils import lpips as lpips_tpu
        model = lpips_tpu.load(weights)
        if model is not None:
            return model
    except Exception as e:  # loader ran but weights were malformed
        print(f"lpips: local loader failed ({e}); trying pip package")
    try:
        import torch  # noqa: F401
        import lpips  # type: ignore
        return lpips.LPIPS(net="vgg")
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--out", default=None,
                    help="output json (default <pred_dir>/info.json)")
    ap.add_argument("--lpips_weights", default=None,
                    help="local LPIPS(vgg) weight file "
                         "(see f2nerf_tpu/utils/lpips.py; also read "
                         "from the LPIPS_WEIGHTS env var)")
    args = ap.parse_args()

    gt_paths = sorted(glob.glob(str(pathlib.Path(args.gt_dir) / "*.png")))
    pred_paths = sorted(
        glob.glob(str(pathlib.Path(args.pred_dir) / "*.png")))
    if len(gt_paths) != len(pred_paths):
        raise SystemExit(f"count mismatch: {len(gt_paths)} gt vs "
                         f"{len(pred_paths)} pred")

    lpips_model = try_lpips(args.lpips_weights)
    psnrs, ssims, lpipss = [], [], []
    for g, p in zip(gt_paths, pred_paths):
        gt = read_image(g)
        pred = read_image(p)
        psnrs.append(psnr(pred, gt))
        ssims.append(ssim(pred, gt))
        if lpips_model is not None:
            import torch
            t = lambda x: torch.from_numpy(  # noqa: E731
                x.transpose(2, 0, 1)[None] * 2 - 1).float()
            with torch.no_grad():
                lpipss.append(float(lpips_model(t(pred), t(gt))))
        print(f"{pathlib.Path(p).name}: psnr={psnrs[-1]:.3f} "
              f"ssim={ssims[-1]:.4f}")

    info = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "n_images": len(gt_paths),
    }
    if lpipss:
        info["lpips_vgg"] = float(np.mean(lpipss))
    else:
        info["lpips_vgg"] = None
        print("lpips: weights absent (the loader itself is exercised "
              "in tests/test_lpips.py; supply real VGG weights via "
              "--lpips_weights / LPIPS_WEIGHTS, built by "
              "scripts/export_lpips_weights.py on a connected machine)")

    out = args.out or str(pathlib.Path(args.pred_dir) / "info.json")
    with open(out, "w") as f:
        json.dump(info, f, indent=2)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
