"""Time the flagship train step and its encode pieces in isolation.

Separates: full step / encode fwd / encode fwd+bwd (params) / encode
fwd+bwd (params+points), at the flagship operating point (8192 rays x
64 samples, L8/C4 2^19). Drives the perf queue (PLAN.md #1).

Run: timeout 590 python scripts/bench_encode_parts.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from f2nerf_tpu.core.config import Config
from f2nerf_tpu.models import hash_field
from f2nerf_tpu.ops import hash_paged


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = Config().model
    rays, s = 8192, cfg.occ_keep * cfg.occ_samples_per_segment
    key = jax.random.key(0)
    params, consts = hash_field.init(key, cfg)
    rng = np.random.default_rng(0)
    # ray-structured points: monotone t per ray like the occ sampler
    o = rng.standard_normal((rays, 1, 3)) * 0.3
    d = rng.standard_normal((rays, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.sort(rng.uniform(0, 4.0, (rays, s, 1)), axis=1)
    pts = jnp.asarray((o + t * d).clip(-1.9, 1.9), jnp.float32)

    meta = hash_field.paged_meta(cfg)
    pages = params["feat_pool"]
    budgets = hash_field.ray_budgets(cfg)
    print("budgets:", budgets)

    enc = jax.jit(lambda pg, p: hash_paged.paged_encode_rays(
        p, pg, meta, budgets, chunk=cfg.encode_chunk))
    print(f"encode fwd: {timeit(enc, pages, pts)*1e3:8.2f} ms")

    def loss_params(pg, p):
        return jnp.sum(hash_paged.paged_encode_rays(
            p, pg, meta, budgets, chunk=cfg.encode_chunk))

    g1 = jax.jit(jax.grad(loss_params, argnums=0))
    print(f"encode fwd+bwd(params): {timeit(g1, pages, pts)*1e3:8.2f} ms")

    g2 = jax.jit(jax.grad(loss_params, argnums=(0, 1)))
    print(f"encode fwd+bwd(params+pts): {timeit(g2, pages, pts)*1e3:8.2f} ms")

    # full train step for context
    import dataclasses
    from f2nerf_tpu.models import occupancy, renderer
    from f2nerf_tpu.train.optim import make_optimizer
    from f2nerf_tpu.train.step import make_train_step

    fcfg = Config()
    fcfg = dataclasses.replace(
        fcfg, train=dataclasses.replace(fcfg.train,
                                        pts_batch_size=rays * 512))
    n_images = 8
    rparams, rconsts = renderer.init(key, fcfg.model, n_images)
    optimizer = make_optimizer(fcfg.train)
    opt_state = optimizer.init(rparams)
    occ_grid = occupancy.init_grid(fcfg.model)
    poses = jnp.tile(jnp.eye(3, 4)[None], (n_images, 1, 1))
    intr = jnp.tile(jnp.asarray(
        [[200.0, 0, 128.0], [0, 200.0, 128.0], [0, 0, 1.0]])[None],
        (n_images, 1, 1))
    step_fn = jax.jit(make_train_step(fcfg, optimizer))
    cam = jnp.asarray(rng.integers(0, n_images, rays), jnp.int32)
    ij = jnp.asarray(rng.integers(0, 256, (rays, 2)), jnp.int32)
    gt = jnp.asarray(rng.random((rays, 3)), jnp.float32)

    def step(p, o_, g_):
        return step_fn(p, o_, g_, rconsts, poses, intr,
                       jnp.asarray(1, jnp.int32), cam, ij, gt)[3]

    print(f"full train step: {timeit(step, rparams, opt_state, occ_grid)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
