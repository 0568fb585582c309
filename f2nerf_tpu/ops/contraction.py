"""Unbounded-scene radial contraction.

For ||x|| <= r the point passes through; outside, it maps onto the shell
(r, 2r): x -> (1 + r - r/||x||) * x/||x|| — reference
``src/hash_3d_anchored.cpp:79-82`` (applied before the hash encode).
Fully differentiable (jnp), so pose gradients flow through it.
"""

from __future__ import annotations

import jax.numpy as jnp


def contract(points: jnp.ndarray, radius: float = 1.0) -> jnp.ndarray:
    """[..., 3] -> [..., 3] radial contraction onto a ball of radius 2r."""
    norm = jnp.linalg.norm(points, axis=-1, keepdims=True)
    safe_norm = jnp.maximum(norm, 1e-12)
    inside = norm <= radius
    outside_pts = (1.0 + radius - radius / safe_norm) * points / safe_norm
    return jnp.where(inside, points, outside_pts)


def uncontract(points: jnp.ndarray, radius: float = 1.0) -> jnp.ndarray:
    """Inverse of :func:`contract` (defined on the open ball of radius
    2r): for rho = ||y|| > r, the world radius is r' = r / (1 + r - rho)
    ... solving rho = (1 + r - r/r') gives r' = r / (1 + r - rho)."""
    rho = jnp.linalg.norm(points, axis=-1, keepdims=True)
    safe_rho = jnp.maximum(rho, 1e-12)
    denom = jnp.maximum(1.0 + radius - safe_rho, 1e-6)
    r_world = radius / denom
    outside = points / safe_rho * r_world
    return jnp.where(rho <= radius, points, outside)
