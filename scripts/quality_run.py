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

The base operating point is ``Config.quality(steps)`` (the validated
flagship: 4096-ray batches @ lr 5e-3, normalized distortion loss at
1e-3 ramping over the middle half of the schedule); CLI flags override
individual fields via ``dataclasses.replace`` so this driver and the
preset cannot drift (ADVICE.md round 1).

``--holdout k`` withholds every k-th view from training and reports its
render PSNR separately — the reference's test driver scores only train
poses (src/main_functions/test.cpp:27-41), which on a 16-view scene can
hide overfitting.

Example (20k-step flagship validation):
  python scripts/quality_run.py /tmp/q20k --scene checker --steps 20000 \
      --holdout 8
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
    ap.add_argument("--scene", choices=("checker", "sphere", "corridor",
                                        "textured", "longtraj", "objcap"),
                    default="checker")
    ap.add_argument("--n_images", type=int, default=16)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--stop_at", type=int, default=None,
                    help="train only to this step but keep --steps as "
                         "the schedule length (LR cosine / var-loss "
                         "ramp) — for branch A/Bs that must share the "
                         "full run's schedule")
    ap.add_argument("--rays", type=int, default=None,
                    help="override; default from Config.quality()")
    ap.add_argument("--lr", type=float, default=None,
                    help="override; default from Config.quality()")
    ap.add_argument("--holdout", type=int, default=0,
                    help="withhold every k-th view from training and "
                         "score it separately (0 = train on all views)")
    ap.add_argument("--sampler", default=None,
                    choices=("occ", "dense"),
                    help="override ModelConfig.sampler_mode")
    ap.add_argument("--n_levels", type=int, default=None)
    ap.add_argument("--log2_table_size", type=int, default=None)
    ap.add_argument("--n_channels", type=int, default=None)
    ap.add_argument("--warp_mode", default=None,
                    choices=("contract", "perspective"))
    ap.add_argument("--warp_blend_k", type=int, default=None,
                    help="smooth chart blending: k nearest anchors "
                         "(1 = hard regions; models/warp.py)")
    ap.add_argument("--occ_thresh", type=float, default=None)
    ap.add_argument("--occ_decay", type=float, default=None)
    ap.add_argument("--occ_explore_targeted", type=int, default=None,
                    help="1/0: stratify explore slots over the "
                         "ineligible set only (models/occupancy.py)")
    ap.add_argument("--occ_trans_eps", type=float, default=None)
    ap.add_argument("--sample_near", type=float, default=None,
                    help="march start offset (ModelConfig.sample_near);"
                         " excises the single-view near-camera shell on"
                         " ring scenes")
    ap.add_argument("--occ_explore_slots", type=int, default=None)
    ap.add_argument("--var_loss_weight", type=float, default=None,
                    help="override; default keeps the reference value")
    ap.add_argument("--var_loss_mode", default=None,
                    choices=("weight_var", "distortion"))
    ap.add_argument("--var_loss_start", type=int, default=None,
                    help="ramp start step (0 with --var_loss_end 1 = "
                         "constant weight from step 0)")
    ap.add_argument("--var_loss_end", type=int, default=None)
    ap.add_argument("--grad_clip_norm", type=float, default=None)
    ap.add_argument("--feat_pool_weight_decay", type=float, default=None)
    ap.add_argument("--explore_sparsity_weight", type=float, default=None)
    ap.add_argument("--global_sparsity_weight", type=float, default=None)
    ap.add_argument("--occ_reg_weight", type=float, default=None,
                    help="occlusion regularizer weight "
                         "(TrainConfig.occ_reg_weight)")
    ap.add_argument("--occ_reg_t", type=float, default=None,
                    help="penalize density at t < this march distance")
    ap.add_argument("--train_app_emb", type=int, default=None,
                    help="1/0: per-image appearance embedding in TRAIN "
                         "renders (0 for appearance-constant captures "
                         "- TrainConfig.train_app_emb)")
    ap.add_argument("--level_anneal_end", type=int, default=None,
                    help="coarse-to-fine: unmask hash levels over the "
                         "first N steps (TrainConfig.level_anneal_end)")
    ap.add_argument("--eval_emb", default="none",
                    choices=("none", "mean"),
                    help="appearance handling for the summary renders: "
                         "'mean' adds the mean trained per-image "
                         "embedding in VALIDATE mode (NeRF-W-style "
                         "test-time appearance; the reference renders "
                         "with none, evaluating the shader off its "
                         "trained manifold — renderer.py eval_emb)")
    ap.add_argument("--supersample", type=int, default=1,
                    help="render summary views at k x resolution and "
                         "box-average down (exact area supersampling)")
    ap.add_argument("--budget_s", type=float, default=540.0,
                    help="wall budget for this invocation's training")
    ap.add_argument("--slice_steps", type=int, default=500,
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

    import jax.numpy as jnp

    from f2nerf_tpu.core.config import Config
    from f2nerf_tpu.data.synthetic import (make_checker_dataset,
                                           make_corridor_dataset,
                                           make_longtraj_dataset,
                                           make_objcap_dataset,
                                           make_sphere_dataset,
                                           make_textured_dataset)
    from f2nerf_tpu.models import renderer
    from f2nerf_tpu.train.loop import Trainer
    from f2nerf_tpu.utils.metrics import psnr, ssim

    make = {"checker": make_checker_dataset,
            "sphere": make_sphere_dataset,
            "corridor": make_corridor_dataset,
            "textured": make_textured_dataset,
            "longtraj": make_longtraj_dataset,
            "objcap": make_objcap_dataset}[args.scene]
    ds = make(n_images=args.n_images, h=args.hw, w=args.hw)
    held, train_ds = [], ds
    if args.holdout > 0:
        held = list(range(0, ds.n_images, args.holdout))
        keep = [i for i in range(ds.n_images) if i not in held]
        train_ds = dataclasses.replace(
            ds, poses=ds.poses[keep], intrinsics=ds.intrinsics[keep],
            dist_params=ds.dist_params[keep], bounds=ds.bounds[keep],
            images=ds.images[keep])
        print(f"holding out views {held} ({len(keep)} train views)")

    cfg = Config.quality(args.steps)
    tkw = dict(report_freq=250, vis_freq=max(args.steps // 4, 1),
               save_freq=10 ** 9)
    if args.rays is not None:
        tkw["pts_batch_size"] = args.rays * 512
    if args.lr is not None:
        tkw["learning_rate"] = args.lr
    for name in ("var_loss_weight", "var_loss_mode", "var_loss_start",
                 "var_loss_end", "grad_clip_norm",
                 "feat_pool_weight_decay", "explore_sparsity_weight",
                 "global_sparsity_weight", "level_anneal_end",
                 "occ_reg_weight", "occ_reg_t"):
        if getattr(args, name) is not None:
            tkw[name] = getattr(args, name)
    if args.train_app_emb is not None:
        tkw["train_app_emb"] = bool(args.train_app_emb)
    mkw = {}
    for src, dst in (("sampler", "sampler_mode"), ("n_levels", "n_levels"),
                     ("log2_table_size", "log2_table_size"),
                     ("n_channels", "n_channels"), ("warp_mode", "warp_mode"),
                     ("warp_blend_k", "warp_blend_k"),
                     ("occ_thresh", "occ_thresh"), ("occ_decay", "occ_decay"),
                     ("occ_trans_eps", "occ_trans_eps"),
                     ("sample_near", "sample_near"),
                     ("occ_explore_slots", "occ_explore_slots")):
        if getattr(args, src) is not None:
            mkw[dst] = getattr(args, src)
    if args.occ_explore_targeted is not None:
        mkw["occ_explore_targeted"] = bool(args.occ_explore_targeted)
    cfg = Config(train=dataclasses.replace(cfg.train, **tkw),
                 model=dataclasses.replace(cfg.model, **mkw))

    tr = Trainer(cfg, train_ds, result_dir=args.result_dir)
    if tr.try_resume():
        print(f"resumed at step {tr.step}")

    # graceful SIGTERM (what `timeout` sends first): finish the current
    # 50-step tranche, checkpoint, and exit — killing the process
    # mid-dispatch has repeatedly wedged the single-client TPU tunnel
    import signal
    got_term = {"v": False}
    signal.signal(signal.SIGTERM,
                  lambda *_: got_term.update(v=True))

    stop = min(args.stop_at or args.steps, args.steps)
    t0 = time.monotonic()
    last_ckpt = tr.step
    while (tr.step < stop and not got_term["v"]
           and time.monotonic() - t0 < args.budget_s):
        tr.run(min(50, stop - tr.step))
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

    if tr.step < stop:
        print(f"budget reached at step {tr.step}/{stop}; re-run "
              "to continue")
        return 1

    # The summary render (VALIDATE compile + one render per view) can
    # take minutes and ignores SIGTERM — starting it with the budget
    # nearly spent invites the caller's kill-after SIGKILL mid-render,
    # the exact tunnel-wedge scenario PLAN.md warns about. If the
    # window lacks comfortable room, defer: the next window resumes at
    # step==stop, skips the train loop, and renders with a full budget.
    summary_s = 150.0 + 3.0 * ds.n_images
    if time.monotonic() - t0 > args.budget_s - summary_s:
        print(f"training done at step {tr.step}; deferring summary "
              f"render to a fresh window (needs ~{summary_s:.0f}s)")
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

    # the reference test driver: render every pose, score per image.
    # Held-out views (never trained on) are scored in the same pass and
    # marked in summary.tsv; their mean is the overfitting-safe number.
    eval_emb = None
    if args.eval_emb == "mean":
        eval_emb = jnp.mean(tr.params["app_emb"], axis=0)
    # LPIPS(vgg): populated when real calibration weights are present
    # (utils/lpips.py — this environment ships none, so the column is
    # NaN but the harness stays executable; VERDICT r4 #7)
    lpips_model = None
    try:
        from f2nerf_tpu.utils import lpips as lpips_lib
        _m = (lpips_lib.load()
              if lpips_lib.default_weights_path() is not None else None)
        if _m is not None:
            import torch

            def lpips_model(a, b):
                def t(x):
                    x = np.ascontiguousarray(x, dtype=np.float32)
                    return (torch.from_numpy(x).permute(2, 0, 1)[None]
                            * 2.0 - 1.0)
                return _m(t(a), t(b))
    except Exception:
        lpips_model = None
    rows = []
    for i in range(ds.n_images):
        ts = time.monotonic()
        rgb, _ = renderer.render_image(
            tr.params, tr.consts, jnp.asarray(ds.poses[i]),
            jnp.asarray(ds.intrinsics[i]),
            ds.height, ds.width, tr.cfg.model, chunk=16384,
            occ_bits=tr.occ_bits(), eval_emb=eval_emb,
            supersample=args.supersample)
        dt = time.monotonic() - ts
        rgb = np.asarray(rgb)
        mse = float(((rgb - ds.images[i]) ** 2).sum())
        score = rgb.size / max(mse, 1e-12)
        tag = "holdout" if i in held else "train"
        lp = (lpips_model(rgb, ds.images[i])
              if lpips_model is not None else float("nan"))
        rows.append((i, score, psnr(rgb, ds.images[i]),
                     ssim(rgb, ds.images[i]), lp, dt, tag))
        print(f"view {i:02d} [{tag}] score={score:.2f} "
              f"psnr={rows[-1][2]:.2f} ssim={rows[-1][3]:.3f} "
              f"lpips={lp:.3f} {dt * 1e3:.0f} ms", flush=True)

    out = args.result_dir / "summary.tsv"
    with open(out, "w") as f:
        f.write("image_idx\tscore\tpsnr\tssim\tlpips\ttime_s\tsplit\n")
        for r in rows:
            f.write(f"{r[0]}\t{r[1]:.4f}\t{r[2]:.4f}\t{r[3]:.4f}"
                    f"\t{r[4]:.4f}\t{r[5]:.4f}\t{r[6]}\n")
    for tag in ("train", "holdout"):
        ps = [r[2] for r in rows if r[6] == tag]
        ss = [r[3] for r in rows if r[6] == tag]
        if ps:
            print(f"done: mean {tag} render PSNR {np.mean(ps):.2f} dB "
                  f"(min {np.min(ps):.2f}, max {np.max(ps):.2f}) "
                  f"SSIM {np.mean(ss):.3f} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
