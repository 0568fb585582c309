#!/usr/bin/env python
"""Eval-time appearance / supersampling A/B on a trained checkpoint.

VERDICT r4 #1 asks how much of the train/holdout render gap is
explained by eval-time appearance handling: the app_emb is TRAIN-only
(reference src/renderer.cpp:100-104), so every VALIDATE render
evaluates the shader off the manifold it trained on (train samples saw
``1 + feat + emb``). This script renders every view of a quality_run
checkpoint under (eval_emb in {none, mean}) x (supersample in {1, 2})
and prints mean train/holdout PSNR/SSIM per arm — no training, pure
measurement.

Usage:
  python scripts/eval_appearance_ab.py _runs/r4_tex48_20k \
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
    ap.add_argument("--supersamples", default="1,2")
    ap.add_argument("--embs", default="none,mean",
                    help="comma list from {none, mean, own}: 'own' "
                         "renders each TRAIN view with its own trained "
                         "embedding (holdouts get the mean) — an upper "
                         "bound quantifying how much per-image "
                         "appearance the model memorized")
    ap.add_argument("--budget_s", type=float, default=520.0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_compilation_cache")
    import jax.numpy as jnp

    from f2nerf_tpu.core.config import Config
    from f2nerf_tpu.data.synthetic import (make_checker_dataset,
                                           make_corridor_dataset,
                                           make_longtraj_dataset,
                                           make_objcap_dataset,
                                           make_sphere_dataset,
                                           make_textured_dataset)
    from f2nerf_tpu.models import occupancy, renderer
    from f2nerf_tpu.train import checkpoint as ckpt_lib
    from f2nerf_tpu.train.loop import Trainer
    from f2nerf_tpu.utils.metrics import psnr, ssim

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
    params, consts = state["params"], state["consts"]
    print(f"restored step {state['step']}")
    mean_emb = jnp.mean(params["app_emb"], axis=0)
    emb_norm = float(jnp.linalg.norm(mean_emb))
    per_norm = float(jnp.mean(jnp.linalg.norm(params["app_emb"], axis=1)))
    print(f"app_emb: mean-vector norm {emb_norm:.3f}, "
          f"mean per-image norm {per_norm:.3f}")

    sss = [int(s) for s in args.supersamples.split(",")]
    emb_modes = args.embs.split(",")
    arms = [(e, s) for s in sss for e in emb_modes]
    # ds index -> training emb row (train views only)
    train_row = {v: r for r, v in enumerate(keep)}
    t0 = time.monotonic()
    print(f"{'arm':<16} {'train PSNR':>10} {'hold PSNR':>10} "
          f"{'train SSIM':>10} {'hold SSIM':>10} {'gap':>6}")
    for emb_mode, ss in arms:
        if time.monotonic() - t0 > args.budget_s:
            print("budget reached; re-run for remaining arms")
            return 1
        accum = {"train": ([], []), "holdout": ([], [])}
        for i in range(ds.n_images):
            if emb_mode == "none":
                emb = None
            elif emb_mode == "mean":
                emb = mean_emb
            else:  # own: per-train-view embedding, mean for holdouts
                emb = (params["app_emb"][train_row[i]]
                       if i in train_row else mean_emb)
            rgb, _ = renderer.render_image(
                params, consts, jnp.asarray(ds.poses[i]),
                jnp.asarray(ds.intrinsics[i]), ds.height, ds.width,
                tr.cfg.model, chunk=16384, occ_bits=occ_bits,
                eval_emb=emb, supersample=ss)
            rgb = np.asarray(rgb)
            tag = "holdout" if i in held else "train"
            accum[tag][0].append(psnr(rgb, ds.images[i]))
            accum[tag][1].append(ssim(rgb, ds.images[i]))
        tp, hp = np.mean(accum["train"][0]), np.mean(accum["holdout"][0])
        tss, hss = np.mean(accum["train"][1]), np.mean(accum["holdout"][1])
        print(f"emb={emb_mode:<5} ss={ss} {tp:>10.2f} {hp:>10.2f} "
              f"{tss:>10.3f} {hss:>10.3f} {tp - hp:>6.2f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
