"""Exponential with truncated gradient.

Forward exp(x); backward g * exp(clamp(x, -100, 5)) — reference
``src/CustomOps/CustomOps.cpp:10-20`` (torch::autograd::TruncExp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(x)
    return y, dx * jnp.exp(jnp.clip(x, -100.0, 5.0))
