"""Dense-point step time on a TRAINED field (the regime that matters:
the reference's early-stop only pays off once rays terminate, i.e.
after the first ~1k steps of a 20k run). Restores a dense-run
checkpoint and times the train step with dense_two_pass on vs off.

    timeout 590 python -u scripts/bench_dense_trained.py _runs/r2_dense20k
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    # args: [run_dir] [arm] [rays]; arm in {all, stats, surv, tp, off}
    # — one arm per invocation keeps each TPU window to a single big
    # compile (the three train-step variants are distinct XLA programs)
    run_dir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                           else "_runs/r2_dense20k")
    arm = sys.argv[2] if len(sys.argv) > 2 else "all"
    rays = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    # optional trans_eps override: probes the LATE-training survivor
    # regime on an early checkpoint (survivor fraction is set by how
    # far transmittance has collapsed; a 3k field keeps ~60% survivors
    # at the shipped 1e-4 while the r3 20k field measured ~25% — the
    # two-pass bucket choice, and therefore its timing, depends only
    # on that fraction)
    trans_eps = float(sys.argv[4]) if len(sys.argv) > 4 else None
    iters = 20

    from f2nerf_tpu.core.config import Config
    from f2nerf_tpu.data.dataset import load_dataset
    from f2nerf_tpu.models import occupancy, renderer
    from f2nerf_tpu.train import checkpoint as ckpt_lib
    from f2nerf_tpu.train.optim import make_optimizer
    from f2nerf_tpu.train.step import make_train_step

    cfg = Config.load(run_dir / "train_config.yaml")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       pts_batch_size=rays * 512))
    assert cfg.model.sampler_mode == "dense", "need a dense run"
    if trans_eps is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           trans_eps=trans_eps))
        print(f"trans_eps override: {trans_eps}")

    # dataset geometry: quality_run scenes are synthetic; rebuild the
    # same scene from the run's inference params (n_images/h/w only
    # matter for ray generation here)
    import yaml
    with open(run_dir / "inference_params.yaml") as f:
        ip = yaml.safe_load(f)
    n_images, h, w = ip["n_images"], ip["height"], ip["width"]

    key = jax.random.key(0)
    params, consts = renderer.init(key, cfg.model, n_images)
    optimizer = make_optimizer(cfg.train)
    opt_state = optimizer.init(params)
    occ_grid = occupancy.init_grid(cfg.model)
    template = {"params": params, "opt_state": opt_state,
                "consts": consts, "step": 0,
                "extra": {"occ_grid": occ_grid}}
    state = ckpt_lib.restore(run_dir / "checkpoints", template)
    params, opt_state = state["params"], state["opt_state"]
    print(f"restored step {state['step']} from {run_dir}")

    from f2nerf_tpu.models import sampler as sampler_mod
    from f2nerf_tpu.ops.composite import exclusive_cumsum
    from f2nerf_tpu.models.renderer import density_activation
    from f2nerf_tpu.models import hash_field

    # the r2/r3 dense quality runs train on the synthetic checker scene
    # (deterministic) — rebuild it for real poses, pixels, and gt
    from f2nerf_tpu.data.synthetic import make_checker_dataset
    ds = make_checker_dataset(n_images=n_images + 2, h=h, w=w)
    from f2nerf_tpu.core.cameras import rays_from_pose

    rng = np.random.default_rng(0)

    def real_rays(n, cam, ij):
        sel_poses = jnp.asarray(ds.poses)[cam]
        sel_intr = jnp.asarray(ds.intrinsics)[cam]
        return rays_from_pose(sel_poses, sel_intr,
                              jnp.asarray(ij, jnp.float32))

    # survivor-prefix distribution on the trained field, real rays
    cam0 = rng.integers(0, n_images, rays).astype(np.int32)
    ij0 = np.stack([rng.integers(0, h, rays),
                    rng.integers(0, w, rays)], -1).astype(np.int32)
    o, d = real_rays(rays, cam0, ij0)
    smp = sampler_mod.sample_rays(o, d, cfg.model, jax.random.key(1))
    feat = hash_field.query_rays(params["field"], consts["field"],
                                 smp.pts, cfg.model)
    sigma = density_activation(feat[..., 0], cfg.model.density_shift)
    sec = jnp.where(smp.dt > 0, sigma * smp.dt, 0.0)
    trans = jnp.exp(-exclusive_cumsum(sec, axis=-1))
    k = jnp.sum(trans > cfg.model.trans_eps, axis=-1)
    k = np.asarray(k)
    print(f"survivor prefix k: mean {k.mean():.0f} p50 "
          f"{np.percentile(k, 50):.0f} p90 {np.percentile(k, 90):.0f} "
          f"max {k.max()} of S={cfg.model.n_samples}")

    # pseudo-row run statistics for the survivor-stream dedup
    # (hash_field.query_compacted): do the measured max run counts on
    # this trained field fit the heuristic budgets?
    from f2nerf_tpu.models.hash_field import (compacted_budgets,
                                              paged_meta)
    from f2nerf_tpu.ops import hash_paged as hp
    mask = trans > cfg.model.trans_eps
    n_surv = int(np.asarray(jnp.sum(mask)))
    flat_mask = np.asarray(mask).ravel()
    order = np.concatenate([np.nonzero(flat_mask)[0],
                            np.nonzero(~flat_mask)[0]])
    s2 = cfg.model.n_samples
    b2 = compacted_budgets(cfg.model, s2)
    if b2 is not None and arm in ("all", "stats", "surv"):
        # quarter bucket — the bucket the ~25% survivor regime selects
        for nb in (smp.pts.shape[0] * s2 // 4,):
            idx = order[:nb - nb % s2]
            pts_c = np.asarray(smp.pts.reshape(-1, 3))[idx]
            from f2nerf_tpu.ops.contraction import contract
            xc = contract(jnp.asarray(pts_c), cfg.model.contraction_radius)
            page_idx, _, _ = hp._page_indices_lm(xc, paged_meta(cfg.model))
            page_idx = np.asarray(page_idx)
            r2 = idx.size // s2
            print(f"survivors {n_surv}/{flat_mask.size} "
                  f"({100*n_surv/flat_mask.size:.0f}%); pseudo-row "
                  f"(s2={s2}) max runs vs budget per level:")
            for lvl, b in enumerate(b2):
                pl = page_idx[lvl].reshape(r2, s2)
                runs = 1 + (pl[:, 1:] != pl[:, :-1]).sum(1)
                print(f"  L{lvl}: max {runs.max()} p90 "
                      f"{int(np.percentile(runs, 90))} budget {b}"
                      f"{' FAIL' if b and runs.max() > b else ''}")

    n_im = n_images
    poses = jnp.asarray(ds.poses)[:n_im]
    intr_b = jnp.asarray(ds.intrinsics)[:n_im]

    arms = {"surv": ((True, True),), "tp": ((True, False),),
            "off": ((False, False),), "stats": (),
            "all": ((True, True), (True, False), (False, False))}[arm]
    for tp, dd in arms:
        cfg_v = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           dense_two_pass=tp,
                                           dense_two_pass_dedup=dd))
        step_fn = jax.jit(make_train_step(cfg_v, optimizer))
        cam = rng.integers(0, n_im, rays).astype(np.int32)
        ij = np.stack([rng.integers(0, h, rays),
                       rng.integers(0, w, rays)], -1).astype(np.int32)
        gt = rng.random((rays, 3)).astype(np.float32)
        p, os_, og, m = step_fn(params, opt_state, occ_grid, consts,
                                poses, intr_b,
                                jnp.asarray(19000, jnp.int32),
                                cam, ij, gt)
        _ = float(m.loss)
        t0 = time.perf_counter()
        for i in range(iters):
            p, os_, og, m = step_fn(params, opt_state, occ_grid,
                                    consts, poses, intr_b,
                                    jnp.asarray(19000 + i, jnp.int32),
                                    cam, ij, gt)
        _ = float(m.loss)
        dt_ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"two_pass={tp} surv_dedup={dd}: {dt_ms:7.2f} ms/step "
              f"({rays / dt_ms * 1e3:7.0f} rays/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
