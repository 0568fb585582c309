"""Multi-level anchored hash-grid encoding (pure jnp path).

TPU-native re-design of the reference CUDA kernels
``src/hash_3d_anchored.cu`` (Hash3DAnchoredForwardKernel /
Hash3DAnchoredBackwardKernel):

* per (point, level): trilinear interpolation of 8 hashed corners with
  hash = ((x*pa) ^ (y*pb) ^ (z*pc)) % table_size over uint32 wraparound
  arithmetic (reference src/hash_3d_anchored.cu:27-58);
* per-level scale mul = exp2(3 + 7*l/15) and per-level random bias anchor
  (src/hash_3d_anchored.cu:72-74);
* the CUDA float->unsigned conversion saturates negatives to 0; we
  reproduce that with max(floor(pt), 0).

Gradients come from JAX autodiff: the feature-pool gradient is the
transpose-of-gather scatter-add, which XLA lowers to a **deterministic**
scatter on TPU — replacing the reference's nondeterministic fp16
``atomicAdd`` race (src/hash_3d_anchored.cu:135-142) and satisfying
BASELINE.md's determinism requirement with no custom VJP at all. Point
gradients flow through the trilinear weights exactly like the reference's
corner-sign trick (src/hash_3d_anchored.cu:122-145). No fp16 loss scaling
is needed (grads accumulate in fp32).

The Pallas kernel path (f2nerf_tpu/kernels/hash_pallas.py) must match this
implementation bit-for-bit in fp32 mode; this file is its oracle.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Corner order d = 0..7 matches the reference kernel
# (src/hash_3d_anchored.cu:37-44): d = (dx << 2) | (dy << 1) | dz.
_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=np.uint32)


def level_scales(n_levels: int, res_base_pow2: float = 3.0,
                 res_fine_pow2: float = 10.0) -> np.ndarray:
    """Per-level scale factors: exp2(base + (fine-base) * l / (L-1))."""
    lvl = np.arange(n_levels, dtype=np.float32)
    denom = max(n_levels - 1, 1)
    return np.exp2(res_base_pow2
                   + (res_fine_pow2 - res_base_pow2) * lvl / denom)


def hash_corner_indices(points: jnp.ndarray, primes: jnp.ndarray,
                        biases: jnp.ndarray, scales: jnp.ndarray,
                        table_size: int
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute hashed corner indices and trilinear weights.

    Args:
      points: [N, 3] contracted points.
      primes: [L, 3] uint32 per-level hash primes.
      biases: [L, 3] float32 per-level anchor offsets.
      scales: [L] float32 per-level resolution multipliers.
      table_size: entries per level (power of two).

    Returns:
      (idx [N, L, 8] int32 in [0, table_size), w [N, L, 8] float32).
    """
    # pt = point * mul + bias, per level: [N, L, 3]
    pt = (points[:, None, :] * scales[None, :, None].astype(points.dtype)
          + biases[None, :, :].astype(points.dtype)).astype(jnp.float32)
    f = jnp.floor(pt)
    frac = pt - f                                           # [N, L, 3]
    # CUDA float2uint saturates negatives to zero.
    ipos = jnp.maximum(f, 0.0).astype(jnp.uint32)           # [N, L, 3]

    corners = jnp.asarray(_CORNERS)                          # [8, 3]
    cpos = ipos[:, :, None, :] + corners[None, None, :, :]   # [N, L, 8, 3]
    p = primes.astype(jnp.uint32)[None, :, None, :]          # [1, L, 1, 3]
    h = ((cpos[..., 0] * p[..., 0])
         ^ (cpos[..., 1] * p[..., 1])
         ^ (cpos[..., 2] * p[..., 2]))                       # [N, L, 8]
    if table_size & (table_size - 1) == 0:
        idx = (h & jnp.uint32(table_size - 1)).astype(jnp.int32)
    else:
        idx = (h % jnp.uint32(table_size)).astype(jnp.int32)

    a = frac[..., 0:1]                                      # [N, L, 1]
    b = frac[..., 1:2]
    c = frac[..., 2:3]
    wx = jnp.concatenate([1.0 - a, a], axis=-1)             # [N, L, 2]
    wy = jnp.concatenate([1.0 - b, b], axis=-1)
    wz = jnp.concatenate([1.0 - c, c], axis=-1)
    # w[d] for d = (dx<<2)|(dy<<1)|dz: outer product, reshaped to [N, L, 8]
    w = (wx[:, :, :, None, None] * wy[:, :, None, :, None]
         * wz[:, :, None, None, :]).reshape(*idx.shape)
    return idx, w


def hash_encode(points: jnp.ndarray, feat_pool: jnp.ndarray,
                primes: jnp.ndarray, biases: jnp.ndarray,
                scales: jnp.ndarray) -> jnp.ndarray:
    """Hash-grid encode.

    Args:
      points: [N, 3] contracted points (float32).
      feat_pool: [L, T, C] feature table (float32 or bfloat16).
      primes: [L, 3] uint32; biases: [L, 3] f32; scales: [L] f32.

    Returns:
      [N, L*C] float32 features, channel-minor per level
      (out[:, l*C + k] = level l, channel k) matching the reference
      layout (src/hash_3d_anchored.cu:79-93).
    """
    n_levels, table_size, n_ch = feat_pool.shape
    idx, w = hash_corner_indices(points, primes, biases, scales, table_size)
    n = points.shape[0]
    # Gather: flatten level axis into the table for a single gather.
    flat = feat_pool.reshape(n_levels * table_size, n_ch)
    level_off = (jnp.arange(n_levels, dtype=jnp.int32)
                 * table_size)[None, :, None]               # [1, L, 1]
    vals = jnp.take(flat, idx + level_off, axis=0,
                    mode="clip")                             # [N, L, 8, C]
    out = jnp.sum(vals.astype(jnp.float32) * w[..., None], axis=2)
    return out.reshape(n, n_levels * n_ch)


def init_primes(rng: np.random.Generator, n_levels: int) -> np.ndarray:
    """Random primes in [2^28, 2^30), 3 per level.

    Reference src/hash_3d_anchored.cpp:28-55 (rejection-samples randints
    until prime).
    """
    def is_prime(x: int) -> bool:
        i = 2
        while i * i <= x:
            if x % i == 0:
                return False
            i += 1
        return True

    vals = []
    while len(vals) < 3 * n_levels:
        v = int(rng.integers(1 << 28, 1 << 30))
        if is_prime(v):
            vals.append(v)
    return np.array(vals, dtype=np.uint32).reshape(n_levels, 3)
