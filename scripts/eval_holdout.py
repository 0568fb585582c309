#!/usr/bin/env python
"""Render held-out views from a trained result and score PSNR/SSIM.

The reference test driver scores only training poses
(src/main_functions/test.cpp:27-41); this evaluates true novel views.
The holdout dir (from scripts/make_synthetic_dataset.py --holdout, or
any cams_meta dataset) carries world-frame poses; they are mapped into
the checkpoint's normalized frame via the training run's
inference_params (normalizing_center/radius), NOT the holdout dir's own
camera-cloud normalization — the two differ whenever the holdout views
are not the training views.

  python scripts/eval_holdout.py <train_result_dir> <holdout_dataset_dir>
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("train_result_dir", type=pathlib.Path)
    ap.add_argument("holdout_dir", type=pathlib.Path)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--out", default=None,
                    help="summary tsv path (default <result>/holdout_summary.tsv)")
    ap.add_argument("--save_images", action="store_true",
                    help="write [gt | pred] strips next to the summary")
    args = ap.parse_args()

    import jax.numpy as jnp

    from f2nerf_tpu.data.dataset import load_dataset
    from f2nerf_tpu.localize.localizer import Localizer
    from f2nerf_tpu.models import renderer
    from f2nerf_tpu.utils.image_io import write_image
    from f2nerf_tpu.utils.metrics import psnr, ssim

    ds = load_dataset(args.holdout_dir)
    loc = Localizer.from_checkpoint(args.train_result_dir)

    # holdout world-frame translations -> the checkpoint's frame
    world_t = ds.poses[:, :3, 3] * ds.radius + ds.center
    poses = ds.poses.copy()
    poses[:, :3, 3] = (world_t - np.asarray(loc.center)) / loc.radius

    rows = []
    out_dir = pathlib.Path(args.out).parent if args.out \
        else args.train_result_dir
    for i in range(ds.n_images):
        t0 = time.monotonic()
        rgb, _ = renderer.render_image(
            loc.params, loc.consts, jnp.asarray(poses[i]),
            jnp.asarray(ds.intrinsics[i]), ds.height, ds.width,
            loc.cfg.model, chunk=args.chunk, occ_bits=loc.occ_bits)
        dt = time.monotonic() - t0
        rgb = np.asarray(rgb)
        p = psnr(rgb, ds.images[i])
        s = ssim(rgb, ds.images[i])
        rows.append((i, p, s, dt))
        print(f"holdout {i:02d} psnr={p:.2f} ssim={s:.4f} "
              f"{dt * 1e3:.0f} ms", flush=True)
        if args.save_images:
            write_image(out_dir / f"holdout_{i:02d}.png",
                        np.concatenate([ds.images[i], rgb], axis=1))

    out = pathlib.Path(args.out) if args.out \
        else args.train_result_dir / "holdout_summary.tsv"
    with open(out, "w") as f:
        f.write("image_idx\tpsnr\tssim\ttime_s\n")
        for r in rows:
            f.write(f"{r[0]}\t{r[1]:.4f}\t{r[2]:.4f}\t{r[3]:.4f}\n")
    ps, ss = [r[1] for r in rows], [r[2] for r in rows]
    print(f"holdout mean PSNR {np.mean(ps):.2f} dB "
          f"(min {np.min(ps):.2f}) SSIM {np.mean(ss):.4f} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
