#!/usr/bin/env python
"""Resumable long-horizon quality run on a synthetic scene.

The reference's quality check is a full 20k-step train followed by
`test` (train_manager.cpp:58-158, test.cpp:11-58). This driver does the
same against the procedural scenes, but resumable in time-budgeted
slices (the TPU tunnel here is single-client and long foreground jobs
must stay under ~10 min — see PLAN.md environment notes): each
invocation resumes from the checkpoint, trains until the step target or
the time budget, checkpoints, and reports. Re-run until it prints
"done"; then it renders every view and writes summary.tsv
(score = H*W/sum MSE, like the reference test driver).

Example (8k-step flagship validation):
  python scripts/quality_run.py /tmp/q_checker --scene checker \
      --steps 8000 --rays 4096 --lr 5e-3 --var_loss_weight 0
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
    ap.add_argument("--scene", choices=("checker", "sphere"),
                    default="checker")
    ap.add_argument("--n_images", type=int, default=16)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--var_loss_weight", type=float, default=None,
                    help="override; default keeps the reference value")
    ap.add_argument("--var_loss_mode", default=None,
                    choices=("weight_var", "distortion"))
    ap.add_argument("--grad_clip_norm", type=float, default=None)
    ap.add_argument("--budget_s", type=float, default=540.0,
                    help="wall budget for this invocation's training")
    ap.add_argument("--slice_steps", type=int, default=250,
                    help="steps between budget checks/checkpoints; keep"
                         " small enough that compile + one tranche fits"
                         " the caller's timeout (an external SIGKILL"
                         " mid-step can wedge the TPU tunnel - PLAN.md)")
    args = ap.parse_args()

    # resumable slices re-jit the same program every invocation; the
    # persistent cache turns the (up to ~8 min) recompile into seconds
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_compilation_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from f2nerf_tpu.core.config import Config, TrainConfig
    from f2nerf_tpu.data.synthetic import (make_checker_dataset,
                                           make_sphere_dataset)
    from f2nerf_tpu.models import renderer
    from f2nerf_tpu.train.loop import Trainer
    from f2nerf_tpu.utils.metrics import psnr

    make = (make_checker_dataset if args.scene == "checker"
            else make_sphere_dataset)
    ds = make(n_images=args.n_images, h=args.hw, w=args.hw)

    tkw = dict(pts_batch_size=args.rays * 512, end_iter=args.steps,
               learning_rate=args.lr, report_freq=250,
               vis_freq=max(args.steps // 4, 1), save_freq=10 ** 9)
    if args.var_loss_weight is not None:
        tkw["var_loss_weight"] = args.var_loss_weight
    if args.var_loss_mode is not None:
        tkw["var_loss_mode"] = args.var_loss_mode
    if args.grad_clip_norm is not None:
        tkw["grad_clip_norm"] = args.grad_clip_norm
    cfg = Config(train=TrainConfig(**tkw))

    tr = Trainer(cfg, ds, result_dir=args.result_dir)
    if tr.try_resume():
        print(f"resumed at step {tr.step}")

    # graceful SIGTERM (what `timeout` sends first): finish the current
    # 50-step tranche, checkpoint, and exit — killing the process
    # mid-dispatch has repeatedly wedged the single-client TPU tunnel
    import signal
    got_term = {"v": False}
    signal.signal(signal.SIGTERM,
                  lambda *_: got_term.update(v=True))

    t0 = time.monotonic()
    last_ckpt = tr.step
    while (tr.step < args.steps and not got_term["v"]
           and time.monotonic() - t0 < args.budget_s):
        tr.run(min(50, args.steps - tr.step))
        if tr.step - last_ckpt >= args.slice_steps or got_term["v"]:
            tr.save_checkpoint()
            last_ckpt = tr.step
            print(f"checkpointed at step {tr.step} "
                  f"({time.monotonic() - t0:.0f}s elapsed)", flush=True)
    if tr.step > last_ckpt:
        tr.save_checkpoint()
        print(f"checkpointed at step {tr.step} "
              f"({time.monotonic() - t0:.0f}s elapsed)", flush=True)
    if got_term["v"]:
        print(f"SIGTERM: checkpointed at step {tr.step}, exiting")
        return 1

    if tr.step < args.steps:
        print(f"budget reached at step {tr.step}/{args.steps}; re-run "
              "to continue")
        return 1

    # field-health diagnostics: the occupancy decision fraction and the
    # mean-sigma EMA distribution expose density inflation (fog) long
    # before it shows in train PSNR — see BENCH_NOTES.md "long-horizon
    # density runaway"
    ob = tr.occ_bits()
    if ob is not None:
        b = np.asarray(ob)
        if b.ndim == 2:
            occ = b[0] > 0
            q50, q90 = np.percentile(b[1][occ], [50, 90])
            print(f"occ diag: occupied {occ.mean():.3f} "
                  f"mean-sigma p50 {q50:.2f} p90 {q90:.2f}")

    # the reference test driver: render every pose, score per image
    rows = []
    for i in range(len(ds.images)):
        ts = time.monotonic()
        rgb, _ = renderer.render_image(
            tr.params, tr.consts, tr.poses[i], tr.intrinsics[i],
            ds.height, ds.width, cfg.model, chunk=16384,
            occ_bits=tr.occ_bits())
        dt = time.monotonic() - ts
        rgb = np.asarray(rgb)
        mse = float(((rgb - ds.images[i]) ** 2).sum())
        score = rgb.size / max(mse, 1e-12)
        rows.append((i, score, psnr(rgb, ds.images[i]), dt))
        print(f"view {i:02d} score={score:.2f} psnr={rows[-1][2]:.2f} "
              f"{dt * 1e3:.0f} ms", flush=True)

    out = args.result_dir / "summary.tsv"
    with open(out, "w") as f:
        f.write("image_idx\tscore\tpsnr\ttime_s\n")
        for r in rows:
            f.write(f"{r[0]}\t{r[1]:.4f}\t{r[2]:.4f}\t{r[3]:.4f}\n")
    ps = [r[2] for r in rows]
    print(f"done: mean render PSNR {np.mean(ps):.2f} dB "
          f"(min {np.min(ps):.2f}, max {np.max(ps):.2f}) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
