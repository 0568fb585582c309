#!/usr/bin/env python
"""Localization robustness envelope (VERDICT r4 #4).

Sweeps initial pose error x differential learning rate against a
trained checkpoint's HELD-OUT views and reports the recovered position
error for the productized staged pipeline (Localizer.localize:
shrinking-rounds particle search + safeguarded auto-lr differential).
The lr sweep deliberately includes rates that diverge under the raw
reference loop (3e-3 did in round 4) to demonstrate the auto-lr fence.

  python scripts/localize_envelope.py _runs/r4_tex48_20k \
      --scene textured --n_images 48 --hw 128 --holdout_every 8
"""
from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("result_dir", type=pathlib.Path)
    ap.add_argument("--scene", default="textured")
    ap.add_argument("--n_images", type=int, default=48)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--holdout_every", type=int, default=8)
    ap.add_argument("--pos_noises", default="0.02,0.05,0.1,0.2")
    ap.add_argument("--lrs", default="2e-4,3e-3,3e-2")
    ap.add_argument("--views", type=int, default=3,
                    help="holdout views per cell (envelope cost control)")
    ap.add_argument("--particles", type=int, default=128)
    ap.add_argument("--search_rounds", type=int, default=3)
    ap.add_argument("--diff_iters", type=int, default=30)
    ap.add_argument("--budget_s", type=float, default=520.0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_compilation_cache")

    from f2nerf_tpu.core.config import Config
    from f2nerf_tpu.data.synthetic import (make_checker_dataset,
                                           make_corridor_dataset,
                                           make_longtraj_dataset,
                                           make_objcap_dataset,
                                           make_sphere_dataset,
                                           make_textured_dataset)
    from f2nerf_tpu.localize.localizer import (Localizer, LocalizerParam,
                                               _euler_rotations)
    from f2nerf_tpu.models import occupancy
    from f2nerf_tpu.train import checkpoint as ckpt_lib
    from f2nerf_tpu.train.loop import Trainer

    make = {"checker": make_checker_dataset, "sphere": make_sphere_dataset,
            "corridor": make_corridor_dataset,
            "textured": make_textured_dataset,
            "longtraj": make_longtraj_dataset,
            "objcap": make_objcap_dataset}[args.scene]
    ds = make(n_images=args.n_images, h=args.hw, w=args.hw)
    held = list(range(0, ds.n_images, args.holdout_every))
    keep = [i for i in range(ds.n_images) if i not in held]
    train_ds = dataclasses.replace(
        ds, poses=ds.poses[keep], intrinsics=ds.intrinsics[keep],
        dist_params=ds.dist_params[keep], bounds=ds.bounds[keep],
        images=ds.images[keep])
    cfg = Config.load(args.result_dir / "train_config.yaml")
    tr = Trainer(cfg, train_ds, result_dir=args.result_dir / "diag_tmp")
    state = ckpt_lib.restore(
        args.result_dir / "checkpoints",
        {"params": tr.params, "opt_state": tr.opt_state,
         "consts": tr.consts, "step": 0,
         "extra": {"occ_grid": tr.occ_grid}})
    occ_bits = (occupancy.occ_values(state["extra"]["occ_grid"],
                                     tr.cfg.model)
                if tr.cfg.model.sampler_mode == "occ" else None)
    print(f"restored step {state['step']}")

    loc = Localizer(state["params"], state["consts"], tr.cfg,
                    np.asarray(ds.intrinsics[0]), np.zeros(3), 1.0,
                    args.hw, args.hw,
                    param=LocalizerParam(render_pixel_num=512),
                    occ_bits=occ_bits, seed=0)

    pos_noises = [float(x) for x in args.pos_noises.split(",")]
    lrs = [float(x) for x in args.lrs.split(",")]
    views = held[:args.views]
    rng_master = np.random.default_rng(7)
    t0 = time.monotonic()
    print(f"{'pos_noise':>9} {'lr':>8} {'err0':>7} {'search':>7} "
          f"{'final':>7} {'bt':>3}")
    for pn in pos_noises:
        for lr in lrs:
            if time.monotonic() - t0 > args.budget_s:
                print("budget reached; re-run for remaining cells")
                return 1
            e0s, e1s, e2s, bts = [], [], [], []
            rng = np.random.default_rng(rng_master.integers(1 << 31))
            for i in views:
                gt_pose = np.asarray(ds.poses[i], dtype=np.float32)
                noisy = gt_pose.copy()
                off = rng.normal(0.0, pn, 3).astype(np.float32)
                noisy[:3, 3] += off
                theta = np.deg2rad(rng.normal(0.0, 2.0, 3))
                noisy[:3, :3] = (_euler_rotations(theta)
                                 @ noisy[:3, :3]).astype(np.float32)
                res = loc.localize(
                    noisy, ds.images[i], particle_num=args.particles,
                    search_rounds=args.search_rounds,
                    noise_coeff=max(2.0, pn * 40.0),
                    diff_iters=args.diff_iters, diff_lr=lr)
                e0s.append(np.linalg.norm(noisy[:3, 3] - gt_pose[:3, 3]))
                e1s.append(np.linalg.norm(
                    res["search_pose"][:3, 3] - gt_pose[:3, 3]))
                e2s.append(np.linalg.norm(
                    res["pose"][:3, 3] - gt_pose[:3, 3]))
                bts.append(res["backtracks"])
            print(f"{pn:>9.3f} {lr:>8.0e} {np.mean(e0s):>7.4f} "
                  f"{np.mean(e1s):>7.4f} {np.mean(e2s):>7.4f} "
                  f"{np.mean(bts):>3.1f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
