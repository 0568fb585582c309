"""Decompose the flagship train step: sampler / encode / shade+composite
/ losses+bwd / adam. Run: timeout 590 python -u scripts/bench_step_parts.py
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
from f2nerf_tpu.models import hash_field, occupancy, renderer, sh_shader
from f2nerf_tpu.ops.composite import composite, density_activation


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
    rays = 8192
    key = jax.random.key(0)
    params, consts = renderer.init(key, cfg, n_images=8)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.standard_normal((rays, 3)) * 0.3, jnp.float32)
    d = rng.standard_normal((rays, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    occ_grid = occupancy.init_grid(cfg)
    occ_bits = occupancy.occ_values(occ_grid, cfg, warmup=True)
    k = jax.random.key(1)

    smp_fn = jax.jit(lambda o_, d_, b_: occupancy.sample_rays_occ(
        o_, d_, b_, cfg, k))
    print(f"occ sampler: {timeit(smp_fn, o, d, occ_bits)*1e3:8.2f} ms")
    smp = smp_fn(o, d, occ_bits)

    q_fn = jax.jit(lambda p, pts: hash_field.query_rays(
        p["field"], consts["field"], pts, cfg))
    print(f"field query fwd: {timeit(q_fn, params, smp.pts)*1e3:8.2f} ms")
    feat = q_fn(params, smp.pts)

    def shade_comp(p, feat_, smp_):
        sigma = density_activation(feat_[..., 0], cfg.density_shift)
        sf = jnp.concatenate([jnp.ones_like(feat_[..., :1]),
                              feat_[..., 1:]], axis=-1)
        r, s = feat_.shape[0], feat_.shape[1]
        dirs = jnp.broadcast_to(smp_.dirs[:, None, :], (r, s, 3))
        colors = sh_shader.query(p["shader"], sf, dirs, cfg)
        sec = jnp.where(smp_.dt > 0.0, sigma * smp_.dt, 0.0)
        bg = jnp.full((r, 3), 0.5)
        return composite(sec, colors, smp_.t, bg, cfg.trans_eps)[0]
    sc_fn = jax.jit(shade_comp)
    print(f"shade+composite fwd: {timeit(sc_fn, params, feat, smp)*1e3:8.2f} ms")

    def render_fwd(p, o_, d_, b_):
        return renderer.render(p, consts, o_, d_, None, cfg, k,
                               train=False, occ_bits=b_).colors
    rf = jax.jit(render_fwd)
    print(f"render fwd total: {timeit(rf, params, o, d, occ_bits)*1e3:8.2f} ms")

    def loss(p, o_, d_, b_):
        res = renderer.render(p, o_, d_, None, cfg, k, train=False,
                              occ_bits=b_) if False else renderer.render(
            p, consts, o_, d_, None, cfg, k, train=False, occ_bits=b_)
        return jnp.mean(jnp.sqrt((res.colors - 0.5) ** 2 + 1e-4))
    gl = jax.jit(jax.grad(loss))
    print(f"render fwd+bwd: {timeit(gl, params, o, d, occ_bits)*1e3:8.2f} ms")

    # occupancy grid refresh (amortized over occ_update_every steps)
    up = jax.jit(lambda g, p: occupancy.update_grid(
        g, lambda pts: renderer.density_at(p, consts, pts, cfg,
                                           contracted=True), k, cfg))
    dt = timeit(up, occ_grid, params, iters=5)
    print(f"occ grid refresh: {dt*1e3:8.2f} ms"
          f" (/{cfg.occ_update_every} = {dt*1e3/cfg.occ_update_every:.2f}"
          " ms/step amortized)")


if __name__ == "__main__":
    main()
