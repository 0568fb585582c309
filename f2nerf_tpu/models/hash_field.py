"""Anchored hash-grid scene field (Hash3DAnchored equivalent).

Reference: ``src/hash_3d_anchored.{hpp,cpp}`` — a 16-level hash-grid
encoder behind a radial contraction, followed by a single Linear(32 -> 16)
head. Parameters are a plain pytree (no module framework) so they shard /
optimize / checkpoint transparently.

Layout choice: the feature pool is ``[L, T, C]`` (level-major) instead of
the reference's flat ``[L*T, C]`` — level-major tables let the Pallas
kernel DMA one level's table into VMEM at a time (SURVEY.md §7 "hard
parts" #1).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from f2nerf_tpu.core.config import ModelConfig
from f2nerf_tpu.ops.contraction import contract
from f2nerf_tpu.ops.hash_encode import hash_encode, init_primes, level_scales

Params = dict[str, Any]


def init(key: jax.Array, cfg: ModelConfig,
         np_seed: int = 2022) -> tuple[Params, Params]:
    """Initialize field parameters and non-trained constants.

    Init distributions replicate the reference:
    * feat_pool ~ (U[0,1) * 0.2 - 1) * 1e-4  (src/hash_3d_anchored.cpp:24)
    * primes: random primes in [2^28, 2^30)   (:28-55)
    * biases ~ U[100, 1100)                   (:56)
    * mlp: torch Linear default U(-1/sqrt(in), 1/sqrt(in))

    Returns:
      (params {feat_pool, mlp}, consts {primes, biases, scales}) — the
    constants are the reference's non-trained registered buffers
    (prim_pool/bias_pool are never in an optimizer group,
    src/hash_3d_anchored.cpp:90-114).
    """
    k_feat, k_bias, k_w, k_b = jax.random.split(key, 4)
    l, t, c = cfg.n_levels, cfg.table_size, cfg.n_channels
    # fp32 master weights; cast to bf16 at compute time in query() —
    # mirrors the reference's fp32 pool + fp16 kernel cast
    # (src/hash_3d_anchored.cu:167 feat_pool.to(kFloat16)).
    feat = (jax.random.uniform(k_feat, (l, t, c)) * 0.2 - 1.0) * 1e-4

    rng = np.random.default_rng(np_seed)
    primes = init_primes(rng, l)

    biases = jax.random.uniform(k_bias, (l, 3)) * 1000.0 + 100.0

    in_dim = l * c
    bound = 1.0 / np.sqrt(in_dim)
    w = jax.random.uniform(k_w, (in_dim, cfg.hash_feat_dim),
                           minval=-bound, maxval=bound)
    b = jax.random.uniform(k_b, (cfg.hash_feat_dim,),
                           minval=-bound, maxval=bound)

    params = {"feat_pool": feat, "mlp": {"w": w, "b": b}}
    consts = {
        "primes": jnp.asarray(primes),
        "biases": biases,
        "scales": jnp.asarray(
            level_scales(l, cfg.res_base_pow2, cfg.res_fine_pow2)),
    }
    return params, consts


def query(params: Params, consts: Params, points: jnp.ndarray,
          cfg: ModelConfig, encode_fn=None) -> jnp.ndarray:
    """Query the field: contraction -> hash encode -> linear head.

    Reference src/hash_3d_anchored.cpp:70-88 (Hash3DAnchored::query).

    Args:
      params: trainable field params from :func:`init`.
      consts: hash constants (primes/biases/scales).
      points: [N, 3] world-space points.
      encode_fn: optional override of the encode implementation
        (e.g. the Pallas kernel); defaults to the pure-jnp path.

    Returns:
      [N, hash_feat_dim] float32 features (channel 0 is raw density).
    """
    x = contract(points, cfg.contraction_radius)
    fn = encode_fn if encode_fn is not None else hash_encode
    pool = params["feat_pool"]
    if cfg.bf16_features:
        pool = pool.astype(jnp.bfloat16)
    feat = fn(x, pool,
              jax.lax.stop_gradient(consts["primes"]),
              jax.lax.stop_gradient(consts["biases"]),
              jax.lax.stop_gradient(consts["scales"]))
    return feat @ params["mlp"]["w"] + params["mlp"]["b"]
