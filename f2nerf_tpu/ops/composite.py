"""Dense masked volume-rendering ops.

TPU-native replacement for the reference's ragged-CSR segment ops
(``src/CustomOps/FlexOps.cu`` Sum/AccumulateSum, ``Scatter.cu`` ScatterIdx,
``CustomOps.cu`` WeightVarLoss) and the renderer's two-pass early-stop
compaction (``src/renderer.cpp:58-122``).

Design (SURVEY.md §7): samples live in a dense ``[n_rays, n_samples]``
layout. Because transmittance is monotone non-increasing along a ray, the
reference's keep-mask (trans > eps) is always a *prefix* of each ray, so
masking densities reproduces the compacted computation exactly:

* FlexOps::Sum            -> masked ``jnp.sum`` over the sample axis
* FlexOps::AccumulateSum  -> masked (ex/in)clusive ``jnp.cumsum``
* ScatterIdx              -> broadcasting
* WeightVar               -> two masked reductions
* early-stop compaction   -> ``sec_density * mask`` (zero contribution)

Everything fuses into one XLA elementwise chain; autodiff of masked
cumsum/sum already matches the reference's hand-written backward kernels
(fill / reversed-suffix-sum), so no custom VJPs are needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from f2nerf_tpu.ops.trunc_exp import trunc_exp


def exclusive_cumsum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Per-row exclusive prefix sum (FlexOps::AccumulateSum include=false,
    reference src/CustomOps/FlexOps.cu:57-75)."""
    return jnp.cumsum(x, axis=axis) - x


def density_activation(raw: jnp.ndarray, shift: float = 3.0) -> jnp.ndarray:
    """sigma = TruncExp(raw - shift) — reference src/renderer.cpp:53-56."""
    return trunc_exp(raw - shift)


def composite(sec_density: jnp.ndarray, colors: jnp.ndarray,
              t: jnp.ndarray, bg_color: jnp.ndarray,
              trans_eps: float = 1e-4
              ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Alpha-composite a dense batch of rays.

    Replicates reference src/renderer.cpp:58-122 (two passes + early-stop)
    in a single masked pass.

    Args:
      sec_density: [R, S] sigma_i * dt_i.
      colors: [R, S, 3] per-sample RGB.
      t: [R, S] ray parameter of each sample (pre +0.01 shift).
      bg_color: [R, 3] background color.
      trans_eps: keep samples with transmittance > eps
        (reference src/renderer.cpp:65).

    Returns:
      (rgb [R, 3], depth [R], weights [R, S], mask [R, S] bool).
      ``weights`` are zero outside the mask, so downstream losses see
      exactly the reference's compacted weight list.
    """
    # Pass 1: transmittance over *all* samples decides the keep mask.
    acc_all = exclusive_cumsum(sec_density, axis=-1)
    mask = jnp.exp(-acc_all) > trans_eps                       # prefix mask

    # Pass 2: composite over kept samples only. Masked densities make the
    # prefix sums identical to compacting (mask is a prefix per ray).
    sd = sec_density * mask
    acc = exclusive_cumsum(sd, axis=-1)
    trans = jnp.exp(-acc)
    alpha = 1.0 - jnp.exp(-sd)                                 # 0 when masked
    weights = trans * alpha                                    # [R, S]

    last_trans = jnp.exp(-jnp.sum(sd, axis=-1))                # [R]
    rgb = (jnp.sum(weights[..., None] * colors, axis=-2)
           + last_trans[..., None] * bg_color)
    # depth = sum w*(t+0.01) / (1 - last_trans + 1e-4), renderer.cpp:107,118
    depth = (jnp.sum(weights * (t + 1e-2), axis=-1)
             / (1.0 - last_trans + 1e-4))
    return rgb, depth, weights, mask


def weight_variance(weights: jnp.ndarray, mask: jnp.ndarray,
                    scale: float = 16.0,
                    pos: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-ray variance of the sample-weight distribution.

    Distortion-style regularizer, reference src/CustomOps/CustomOps.cu:13-67
    (WeightVarLoss): positions are i/SCALE for the i-th *kept* sample of
    the reference's UNIFORM march — i.e. spatial position t/(step*SCALE).
    Pass ``pos`` (e.g. t / (sample_l * SCALE)) for samplers whose slot
    index is not proportional to distance (the occupancy sampler skips
    space between kept segments; index-space variance there is
    spatially meaningless). Defaults to i/SCALE (exact reference
    semantics for the dense sampler and the numpy oracle).

    Args:
      weights: [R, S] compositing weights (zero outside mask).
      mask: [R, S] keep mask.
      scale: SCALE=16 position divisor.
      pos: optional [R, S] sample positions overriding i/scale.

    Returns:
      [R] per-ray variance.
    """
    s = weights.shape[-1]
    if pos is None:
        pos = (jnp.arange(s, dtype=jnp.float32) / scale)[None, :]
    w = weights * mask
    weight_sum = jnp.sum(w, axis=-1) + 1e-6
    mean = jnp.sum(w * pos, axis=-1) / weight_sum
    bias = pos - mean[..., None]
    return jnp.sum(w * bias * bias, axis=-1)


def distortion_loss(weights: jnp.ndarray, t: jnp.ndarray, dt: jnp.ndarray,
                    mask: jnp.ndarray, march_len: float) -> jnp.ndarray:
    """Normalized mip-NeRF-360-style distortion loss, per ray.

    Config alternative (``TrainConfig.var_loss_mode='distortion'``) to the
    reference's UNNORMALIZED weight variance (``weight_variance`` above,
    src/CustomOps/CustomOps.cu:13-36): on unbounded / sky-at-far-range
    scenes the reference loss' gradient pushes all weights down — far
    positions hardest — and erases legitimate far content (measured,
    BENCH_NOTES.md). The distortion loss instead penalizes the *spread*
    of each ray's weight distribution on normalized positions: a
    concentrated surface at ANY depth gets near-zero loss, while
    floaters / fog pay.

    L(ray) = sum_{i,j} w_i w_j |s_i - s_j| + (1/3) sum_i w_i^2 d_i
    with s = interval midpoints / march_len, d = interval widths /
    march_len. Computed in O(S) via exclusive prefix sums — positions of
    nonzero-weight samples are monotone along the ray (both samplers),
    so |s_i - s_j| = s_i - s_j for j < i.

    Args:
      weights: [R, S] compositing weights (zero outside mask).
      t: [R, S] sample distances.
      dt: [R, S] per-sample interval widths (0 for invalid slots).
      mask: [R, S] keep mask.
      march_len: total march length (n_samples * sample_l) normalizing
        positions into [0, 1].

    Returns:
      [R] per-ray distortion.
    """
    w = weights * mask
    # sample i covers (t_i - dt_i, t_i]; midpoint in normalized coords
    s_mid = (t - 0.5 * dt) / march_len
    d = dt / march_len
    wm = w * s_mid
    cw = exclusive_cumsum(w, axis=-1)
    cwm = exclusive_cumsum(wm, axis=-1)
    loss_bi = 2.0 * jnp.sum(w * (s_mid * cw - cwm), axis=-1)
    loss_uni = jnp.sum(w * w * d, axis=-1) / 3.0
    return loss_bi + loss_uni
