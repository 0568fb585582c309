"""Spherical-harmonics directional shader.

Reference: ``src/sh_shader.{hpp,cpp,cu}`` — input is the concatenation of a
16-d shading feature and the degree-4 SH encoding of the view direction,
passed through Linear(32->64) -> ReLU -> Linear(64->3) and squashed by a
widened sigmoid ``(1 + 2*eps) / (1 + exp(-x)) - eps`` with eps=1e-3
(src/sh_shader.cpp:22-29).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from f2nerf_tpu.core.config import ModelConfig
from f2nerf_tpu.ops.sh import sh_encode

Params = dict[str, Any]

_EPS = 1e-3


def init(key: jax.Array, cfg: ModelConfig) -> Params:
    d_in = cfg.shader_in_dim
    d_hidden = cfg.shader_hidden_dim
    k0w, k0b, k1w, k1b = jax.random.split(key, 4)
    b0 = 1.0 / np.sqrt(d_in)
    b1 = 1.0 / np.sqrt(d_hidden)
    return {
        "w0": jax.random.uniform(k0w, (d_in, d_hidden), minval=-b0, maxval=b0),
        "b0": jax.random.uniform(k0b, (d_hidden,), minval=-b0, maxval=b0),
        "w1": jax.random.uniform(k1w, (d_hidden, 3), minval=-b1, maxval=b1),
        "b1": jax.random.uniform(k1b, (3,), minval=-b1, maxval=b1),
    }


def query(params: Params, feats: jnp.ndarray, dirs: jnp.ndarray,
          cfg: ModelConfig) -> jnp.ndarray:
    """[..., F] feats + [..., 3] unit dirs -> [..., 3] RGB in (-eps, 1+eps).

    Differentiable w.r.t. ``dirs`` (the reference's SH CUDA kernel is not —
    SURVEY.md N3), which makes localizer pose gradients exact.
    """
    enc = sh_encode(dirs, cfg.sh_degree)
    x = jnp.concatenate([feats, enc], axis=-1)
    h = jax.nn.relu(x @ params["w0"] + params["b0"])
    out = h @ params["w1"] + params["b1"]
    return (1.0 + 2.0 * _EPS) * jax.nn.sigmoid(out) - _EPS
