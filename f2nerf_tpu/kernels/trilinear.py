"""Pallas TPU kernels for the paged hash-grid trilinear contraction.

The paged encode (ops/hash_paged.py) is: XLA row-gather -> trilinear
contraction of each fetched 5x5x5 haloed page against per-point weights.
XLA executes the contraction ~10x off roofline because it materializes
the [N, L, 128] weight rows (measured: ~24 ms per 2M rows vs ~2.5 ms of
raw traffic). These kernels build the weights in-register and stream the
rows once.

Layout: the (point, level) pairs are FLATTENED into one row stream — the
kernel does not care which level a row belongs to, because the weights
depend only on the packed (local, frac) coords. This sidesteps Mosaic's
block-width rules (last dim must be 128-divisible or full) that a
per-level column layout would violate:

* rows  [M, C*128] bf16   (M = N * L)
* combo [M, 8] f32        lanes: lx, ly, lz, fx, fy, fz, pad, pad
* out   [M, 8] f32        lanes 0..C-1 = feature channels

Weight math: haloed-page slot s in [0, 125) = (sx*25 + sy*5 + sz) has
w[s] = wx[sx] * wy[sy] * wz[sz], where per axis
w_ax[v] = (1-f)*[v==l] + f*[v==l+1]. Pad slots (125..127) never match
any l in [0, 4), so their weight is exactly 0. The backward d_frac path
is the analytic corner-sign gradient (reference
src/hash_3d_anchored.cu:122-133 equivalent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_PAD = 128
TILE = 1024  # rows per grid step
OUT_W = 8    # lane-padded small outputs


def _slot_iotas():
    s = jax.lax.broadcasted_iota(jnp.int32, (1, ROW_PAD), 1)
    return ((s // 25).astype(jnp.float32),
            ((s // 5) % 5).astype(jnp.float32),
            (s % 5).astype(jnp.float32))


def _axis_factors(loc, fr, s_ax):
    """loc/fr: [T, 1]; s_ax: [1, 128] -> (w [T,128], dw [T,128]).

    Trilinear axis weight as a hat function: slot s gets
    w = relu(1 - |s - (l + f)|), which is (1-f) at s==l and f at s==l+1
    and 0 elsewhere — identical values to the one-hot-pair form but
    ~2x fewer VPU ops. dw/df = sign(s - l - f) inside the hat support.
    """
    t = s_ax - (loc + fr)
    at = jnp.abs(t)
    w = jnp.maximum(0.0, 1.0 - at)
    dw = jnp.where(at < 1.0, jnp.sign(t), 0.0)
    return w, dw


def _weights(combo_ref):
    sx, sy, sz = _slot_iotas()
    wx, dwx = _axis_factors(combo_ref[:, 0:1], combo_ref[:, 3:4], sx)
    wy, dwy = _axis_factors(combo_ref[:, 1:2], combo_ref[:, 4:5], sy)
    wz, dwz = _axis_factors(combo_ref[:, 2:3], combo_ref[:, 5:6], sz)
    return (wx, wy, wz), (dwx, dwy, dwz)


def _fwd_kernel(rows_ref, combo_ref, sel_ref, out_ref, *, n_channels):
    """Per-channel weighted lane reduction, as ONE MXU matmul.

    A cross-lane `jnp.sum(ch * w, axis=1)` keeps the VPU busy shuffling
    (measured ~3x slower than this form): instead compute the full
    elementwise product prod = rows * tiled(w) [T, C*128] and contract
    it against a constant block-ones selection matrix [C*128, 8]
    (sel[c*128+l, c] = 1) — the systolic array does the lane reduction.
    """
    (wx, wy, wz), _ = _weights(combo_ref)
    w = wx * wy * wz                                       # [T, 128]
    wt = jnp.concatenate([w] * n_channels, axis=1)         # [T, C*128]
    prod = rows_ref[:].astype(jnp.float32) * wt
    out_ref[:] = jax.lax.dot_general(
        prod, sel_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [T, 8]


def _bwd_rows_kernel(combo_ref, g_ref, drows_ref, *, n_channels):
    """d_rows = g (x) w — does NOT read the fetched rows, so in training
    (where point gradients are unused because poses are data) XLA can
    dead-code-eliminate the backward row re-gather entirely; keeping
    this separate from the d_frac kernel is what makes that possible."""
    (wx, wy, wz), _ = _weights(combo_ref)
    w = wx * wy * wz
    for c in range(n_channels):
        gc = g_ref[:, c:c + 1]
        sl = slice(c * ROW_PAD, (c + 1) * ROW_PAD)
        drows_ref[:, sl] = (gc * w).astype(drows_ref.dtype)


def _bwd_frac_kernel(rows_ref, combo_ref, g_ref, dfrac_ref,
                     *, n_channels):
    """d_frac (point-gradient path; alive only for pose optimization)."""
    (wx, wy, wz), (dwx, dwy, dwz) = _weights(combo_ref)
    d_w = jnp.zeros_like(wx)
    for c in range(n_channels):
        gc = g_ref[:, c:c + 1]
        sl = slice(c * ROW_PAD, (c + 1) * ROW_PAD)
        d_w = d_w + gc * rows_ref[:, sl].astype(jnp.float32)
    dfrac_ref[:] = jnp.concatenate([
        jnp.sum(d_w * dwx * wy * wz, axis=1, keepdims=True),
        jnp.sum(d_w * wx * dwy * wz, axis=1, keepdims=True),
        jnp.sum(d_w * wx * wy * dwz, axis=1, keepdims=True),
        jnp.zeros((rows_ref.shape[0], OUT_W - 3), jnp.float32),
    ], axis=1)                                             # [T, 8]


def _pack_combo(local: jnp.ndarray, frac: jnp.ndarray) -> jnp.ndarray:
    """local/frac [..., 3] -> [M, 8] packed float rows."""
    m = int(np_prod(local.shape[:-1]))
    combo = jnp.concatenate(
        [local.reshape(m, 3).astype(jnp.float32), frac.reshape(m, 3)],
        axis=1)
    return jnp.pad(combo, ((0, 0), (0, OUT_W - 6)))


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


@functools.lru_cache(maxsize=8)
def _sel_matrix(n_channels: int):
    """Block-ones channel-selection matrix [C*128, 8] (f32 constant)."""
    import numpy as np
    sel = np.zeros((n_channels * ROW_PAD, OUT_W), np.float32)
    for c in range(n_channels):
        sel[c * ROW_PAD:(c + 1) * ROW_PAD, c] = 1.0
    return sel


def contract_fwd(rows: jnp.ndarray, local: jnp.ndarray, frac: jnp.ndarray,
                 n_levels: int, n_channels: int) -> jnp.ndarray:
    """rows [N, L*C*128] bf16; local/frac [N, L, 3] -> feat [N, L*C] f32.
    N*L must be a multiple of TILE."""
    n = rows.shape[0]
    m = n * n_levels
    cw = n_channels * ROW_PAD
    combo = _pack_combo(local, frac)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_channels=n_channels),
        grid=(m // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, cw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, OUT_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, OUT_W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, OUT_W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, OUT_W), jnp.float32),
    )(rows.reshape(m, cw), combo, jnp.asarray(_sel_matrix(n_channels)))
    return out[:, :n_channels].reshape(n, n_levels * n_channels)


def contract_bwd_rows(local: jnp.ndarray, frac: jnp.ndarray,
                      g: jnp.ndarray, n_levels: int, n_channels: int,
                      out_dtype) -> jnp.ndarray:
    """d_rows [N, L*C*128] = g (x) w. Row-free — see _bwd_rows_kernel."""
    n = local.shape[0]
    m = n * n_levels
    cw = n_channels * ROW_PAD
    combo = _pack_combo(local, frac)
    g_pad = jnp.pad(g.reshape(m, n_channels),
                    ((0, 0), (0, OUT_W - n_channels)))
    d_rows = pl.pallas_call(
        functools.partial(_bwd_rows_kernel, n_channels=n_channels),
        grid=(m // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, OUT_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, OUT_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, cw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cw), out_dtype),
    )(combo, g_pad)
    return d_rows.reshape(n, n_levels * cw)


def contract_bwd_frac(rows: jnp.ndarray, local: jnp.ndarray,
                      frac: jnp.ndarray, g: jnp.ndarray, n_levels: int,
                      n_channels: int) -> jnp.ndarray:
    """d_frac [N, L, 3] — the point-gradient path; alive only when pose
    gradients are requested (localizer), DCE'd in training."""
    n = local.shape[0]
    m = n * n_levels
    cw = n_channels * ROW_PAD
    combo = _pack_combo(local, frac)
    g_pad = jnp.pad(g.reshape(m, n_channels),
                    ((0, 0), (0, OUT_W - n_channels)))
    d_frac = pl.pallas_call(
        functools.partial(_bwd_frac_kernel, n_channels=n_channels),
        grid=(m // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, cw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, OUT_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, OUT_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, OUT_W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, OUT_W), jnp.float32),
    )(rows.reshape(m, cw), combo, g_pad)
    return d_frac[:, :3].reshape(n, n_levels, 3)
