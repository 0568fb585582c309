"""Benchmark: training-step throughput (rays/s/chip, fwd+bwd) on the
flagship F2-NeRF operating point (512 rays x 1024 samples/ray, 16-level
2^19 hash grid — reference envelope, BASELINE.md).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is the F2-NeRF paper's implied training throughput on an RTX
2080Ti (~20k steps x 512 rays in ~12 min ≈ 14.2k rays/s), the only
external anchor available.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_RAYS_PER_S = 14200.0  # F2-NeRF paper, RTX 2080Ti (see docstring)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny config, few iters (CI smoke)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rays", type=int, default=None,
                    help="override rays/step")
    ap.add_argument("--dense", action="store_true",
                    help="reference-parity operating point: dense "
                         "sampler, 512 rays x 1024 samples "
                         "(train_manager.cpp:69-70, points_sampler.hpp)")
    args = ap.parse_args()

    from f2nerf_tpu.core.config import Config
    from f2nerf_tpu.models import renderer
    from f2nerf_tpu.train.optim import make_optimizer
    from f2nerf_tpu.train.step import make_train_step

    import dataclasses

    cfg = Config.tiny() if args.quick else Config()
    if args.dense:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           sampler_mode="dense"))
        if args.rays is None:
            args.rays = 512
    rays = args.rays
    if rays is None and not args.quick:
        # throughput bench: saturate the chip (the reference's 512-ray
        # batch is latency-bound at occ-mode sample counts)
        rays = 8192
    if rays:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           pts_batch_size=rays * 512))
    batch = cfg.train.rays_per_step
    n_images = 8

    from f2nerf_tpu.models import occupancy

    key = jax.random.key(0)
    params, consts = renderer.init(key, cfg.model, n_images)
    optimizer = make_optimizer(cfg.train)
    opt_state = optimizer.init(params)
    occ_grid = occupancy.init_grid(cfg.model)
    if cfg.model.sampler_mode == "occ":
        # Seed a realistic ~25%-occupied grid: steady-state (past
        # occ_warmup) with an EMPTY grid would make every slot an
        # invalid segment-0 re-walk — degenerate clustered gathers that
        # overstate throughput.
        thresh = occupancy.sigma_threshold(cfg.model)
        occ_rng = np.random.default_rng(1)
        dense = jnp.asarray(
            occ_rng.random(occ_grid.shape[-3:]) < 0.25, jnp.float32)
        seeded = dense * (2.0 * thresh)
        if occ_grid.ndim == 4:
            occ_grid = jnp.stack([seeded, seeded])
        else:
            occ_grid = seeded

    h, w = 256, 256
    rng = np.random.default_rng(0)
    poses = jnp.tile(jnp.eye(3, 4)[None], (n_images, 1, 1))
    intr = jnp.tile(jnp.asarray(
        [[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1.0]])[None],
        (n_images, 1, 1))

    step_fn = jax.jit(make_train_step(cfg, optimizer),
                      donate_argnums=(0, 1, 2))

    def batch_data():
        cam = rng.integers(0, n_images, batch).astype(np.int32)
        ij = np.stack([rng.integers(0, h, batch),
                       rng.integers(0, w, batch)], -1).astype(np.int32)
        gt = rng.random((batch, 3)).astype(np.float32)
        return cam, ij, gt

    # Measure steady state: past occ_warmup_steps (real occupancy bits)
    # and past occ_refresh_warmup (slow partial-refresh cadence) — the
    # regime 90% of a 20k-step run spends its time in.
    step0 = max(cfg.model.occ_warmup_steps,
                cfg.model.occ_refresh_warmup) + 1024

    # warmup / compile (float() forces real completion; NB
    # block_until_ready does not actually block under the axon platform)
    cam, ij, gt = batch_data()
    params, opt_state, occ_grid, m = step_fn(
        params, opt_state, occ_grid, consts, poses, intr,
        jnp.asarray(step0, jnp.int32), cam, ij, gt)
    _ = float(m.loss)

    iters = 10 if args.quick else args.iters
    batches = [batch_data() for _ in range(iters)]
    t0 = time.perf_counter()
    for k, (cam, ij, gt) in enumerate(batches):
        params, opt_state, occ_grid, m = step_fn(
            params, opt_state, occ_grid, consts, poses, intr,
            jnp.asarray(step0 + k + 1, jnp.int32), cam, ij, gt)
    _ = float(m.loss)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    rays_per_s = iters * batch / dt / n_chips
    if cfg.model.sampler_mode == "occ":
        spr = cfg.model.occ_keep * cfg.model.occ_samples_per_segment
        mode = f"occ sampler, {spr} samples/ray"
    else:
        mode = (f"dense, {cfg.model.n_samples} samples/ray"
                + (", reference-parity point 512x1024"
                   if args.dense else ""))
    print(json.dumps({
        "metric": "train_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": f"rays/s/chip (fwd+bwd+adam, {mode})"
        if not args.quick else "rays/s/chip (tiny cfg)",
        "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
