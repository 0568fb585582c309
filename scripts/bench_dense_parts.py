"""Decompose the DENSE-parity train step (512 rays x 1024 samples —
the reference operating point, train_manager.cpp:69-70) to locate the
gap between the measured step time and the row-rate floor
(ROOFLINE.md). Run: timeout 590 python -u scripts/bench_dense_parts.py
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

from f2nerf_tpu.core.config import Config
from f2nerf_tpu.models import hash_field, renderer, sampler as sampler_mod
from f2nerf_tpu.train.optim import make_optimizer
from f2nerf_tpu.train.step import make_train_step


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    rays = 512
    cfg_full = Config()
    cfg_full = dataclasses.replace(
        cfg_full,
        model=dataclasses.replace(cfg_full.model, sampler_mode="dense"),
        train=dataclasses.replace(cfg_full.train,
                                  pts_batch_size=rays * 512))
    cfg = cfg_full.model
    s = cfg.n_samples
    print(f"dense point: {rays} rays x {s} samples, "
          f"budgets={hash_field.ray_budgets(cfg)}")

    key = jax.random.key(0)
    params, consts = renderer.init(key, cfg, n_images=8)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.standard_normal((rays, 3)) * 0.3, jnp.float32)
    d = rng.standard_normal((rays, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    k = jax.random.key(1)

    smp_fn = jax.jit(lambda o_, d_: sampler_mod.sample_rays(
        o_, d_, cfg, k))
    print(f"dense sampler:        {timeit(smp_fn, o, d)*1e3:8.2f} ms")
    smp = smp_fn(o, d)
    pts = smp.pts

    q_fn = jax.jit(lambda p, pts_: hash_field.query_rays(
        p["field"], consts["field"], pts_, cfg))
    print(f"encode fwd (dedup):   {timeit(q_fn, params, pts)*1e3:8.2f} ms")

    cfg_nd = dataclasses.replace(cfg, encode_dedup=False)
    qnd_fn = jax.jit(lambda p, pts_: hash_field.query_rays(
        p["field"], consts["field"], pts_, cfg_nd))
    print(f"encode fwd (nodedup): {timeit(qnd_fn, params, pts)*1e3:8.2f} ms")

    def enc_loss(p, pts_):
        return jnp.sum(hash_field.query_rays(
            p["field"], consts["field"], pts_, cfg).astype(jnp.float32))

    g_fn = jax.jit(jax.grad(enc_loss))
    print(f"encode fwd+bwd:       {timeit(g_fn, params, pts)*1e3:8.2f} ms")

    gnd_fn = jax.jit(jax.grad(
        lambda p, pts_: jnp.sum(hash_field.query_rays(
            p["field"], consts["field"], pts_, cfg_nd
        ).astype(jnp.float32))))
    print(f"encode f+b (nodedup): {timeit(gnd_fn, params, pts)*1e3:8.2f} ms")

    # full render fwd (train=True, masked compositing)
    def render_loss(p, o_, d_):
        res = renderer.render(p, consts, o_, d_,
                              jnp.zeros((rays,), jnp.int32), cfg,
                              jax.random.key(2), train=True)
        return jnp.mean(res.colors.astype(jnp.float32))

    rf = jax.jit(render_loss)
    print(f"render fwd:           {timeit(rf, params, o, d)*1e3:8.2f} ms")
    rg = jax.jit(jax.grad(render_loss))
    print(f"render fwd+bwd:       {timeit(rg, params, o, d)*1e3:8.2f} ms")

    # full train step (losses + adam)
    optimizer = make_optimizer(cfg_full.train)
    opt_state = optimizer.init(params)
    from f2nerf_tpu.models import occupancy
    occ_grid = occupancy.init_grid(cfg)
    n_images = 8
    poses = jnp.tile(jnp.eye(3, 4)[None], (n_images, 1, 1))
    intr = jnp.tile(jnp.asarray(
        [[200.0, 0, 128.0], [0, 200.0, 128.0], [0, 0, 1.0]])[None],
        (n_images, 1, 1))
    step_fn = jax.jit(make_train_step(cfg_full, optimizer))
    cam = rng.integers(0, n_images, rays).astype(np.int32)
    ij = np.stack([rng.integers(0, 256, rays),
                   rng.integers(0, 256, rays)], -1).astype(np.int32)
    gt = rng.random((rays, 3)).astype(np.float32)

    def full(p, os_, og):
        return step_fn(p, os_, og, consts, poses, intr,
                       jnp.asarray(3000, jnp.int32), cam, ij, gt)

    print(f"full train step:      "
          f"{timeit(full, params, opt_state, occ_grid)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
