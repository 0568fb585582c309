"""Uniform stratified ray sampler (dense layout).

Reference: ``src/points_sampler.{hpp,cpp}`` (PtsSampler::get_samples) —
fixed S samples per ray at step SAMPLE_L with per-sample stratified jitter
``(U[0,1) - 0.5) + 1`` in TRAIN and 1.0 in VALIDATE, accumulated with a
cumulative sum so each ray marches ~S*SAMPLE_L units. The reference then
flattens to a ragged CSR layout; we keep the dense ``[R, S]`` grid
(SURVEY.md §7) — the reference's sampler is fixed-S anyway.

dt_i = t_i - t_{i-1} with dt_0 = 0, matching the reference's
``||p_i - p_{i-1}||`` on normalized directions with a zero first entry
(src/points_sampler.cpp:46-48).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from f2nerf_tpu.core.config import ModelConfig


class Samples(NamedTuple):
    pts: jnp.ndarray    # [R, S, 3]
    dirs: jnp.ndarray   # [R, 3] unit direction per ray
    dt: jnp.ndarray     # [R, S]
    t: jnp.ndarray      # [R, S]


def sample_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                cfg: ModelConfig, key: jax.Array | None) -> Samples:
    """Stratified-march rays.

    Args:
      rays_o: [R, 3] origins.
      rays_d: [R, 3] directions (normalized here, points_sampler.cpp:24).
      cfg: model config (n_samples, sample_l).
      key: PRNG key for TRAIN jitter; None = VALIDATE (no jitter).
    """
    r = rays_o.shape[0]
    s = cfg.n_samples
    dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if key is None:
        noise = jnp.ones((r, s), dtype=jnp.float32)
    else:
        noise = jax.random.uniform(key, (r, s)) - 0.5 + 1.0
    t = cfg.sample_near + jnp.cumsum(noise, axis=-1) * cfg.sample_l  # [R, S]

    pts = rays_o[:, None, :] + dirs[:, None, :] * t[..., None]  # [R, S, 3]
    dt = jnp.diff(t, axis=-1, prepend=t[:, :1])                 # dt_0 = 0
    return Samples(pts=pts, dirs=dirs, dt=dt, t=t)
