"""Paged multi-level hash-grid encoding — the TPU-native fast path.

Why this exists (measured on TPU v5e, see git history): XLA's gather is
row-rate-bound (~4-10 ns/row, width free up to ~1 KB) and XLA's
scatter-add is ~20x slower and serial, while Pallas in-kernel dynamic
addressing is slower still (~170 ns/access). A naive per-corner hash
gather (8 corners x 16 levels per point, as the reference CUDA kernel
does at src/hash_3d_anchored.cu:61-93) therefore costs 128 row fetches
per point. This module restructures the *data layout* so the whole
encode needs ONE wide row fetch per (point, level) and the backward
becomes a `segment_sum` (also row-rate-bound, deterministic) instead of
a scatter:

* The table is stored as **pages**: 4x4x4-cell blocks, C channels.
* The page hash is **additive**: page(Xb, Yb, Zb) = (A*Xb + B*Yb + Zb)
  mod N with per-level odd constants A, B. Additivity means the
  +1-block neighbors of page p are pages p+A, p+B, p+1 — so a
  **haloed** table (each page extended to 5x5x5 with its +x/+y/+z
  neighbor entries) can be materialized per step with three
  roll+concat dense ops, no gather. A point's 8 trilinear corners
  always live inside one haloed page.
* Coarse levels whose block grid fits the budget are stored **dense**
  (A = res^2, B = res — exact indexing, zero collisions); finer levels
  hash with random odd A, B. Single-axis collisions are impossible
  (A odd, power-of-two page count); cross-axis collisions form a
  determinant-N lattice — the same 1/N density as the reference's
  XOR-prime hash.
* Rows are **channel-major and lane-padded**: a haloed page is stored
  as [C, 128] (125 cells + 3 pad) so the trilinear reduction runs over
  a full 128-lane axis.
* Forward: one `jnp.take` of [P_total, C*128] rows per (point, level);
  trilinear interpolation is a dot_general against a weight row built
  from three 5-wide one-hot pairs by static repeat/tile (pure
  lane-dimension VPU work).
* Backward (custom VJP): cotangents w.r.t. the fetched rows reduce into
  pages with `jax.ops.segment_sum` — deterministic across runs and
  shard counts (BASELINE.md requirement), replacing both the
  reference's fp16 atomicAdd race (src/hash_3d_anchored.cu:135-142)
  and XLA's serial scatter. Point gradients come from `jax.vjp` of the
  contraction (equivalent to the reference's corner-sign analytic
  gradient, src/hash_3d_anchored.cu:122-133).

Total parameter capacity (sum over levels of pages*64*C) is configured
to match the reference's 2^19 x 16 x 2 pool.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 4            # cells per page axis
HALO = BLOCK + 1     # haloed page axis
PAGE_CELLS = HALO * HALO * HALO   # 125 haloed cells
ROW_PAD = 128        # lane-padded row width per channel


class PagedMeta(NamedTuple):
    """Static per-level constants for the paged encode."""
    n_levels: int
    n_channels: int
    n_pages: tuple[int, ...]       # pages per level
    page_offset: tuple[int, ...]   # cumulative offsets into the page table
    a: np.ndarray                  # [L] uint32 additive x constant
    b: np.ndarray                  # [L] uint32 additive y constant
    dense: tuple[bool, ...]        # level stored dense (no collisions)
    scales: np.ndarray             # [L] float32 resolution multipliers
    biases: np.ndarray             # [L, 3] float32 anchors

    @property
    def total_pages(self) -> int:
        return self.page_offset[-1] + self.n_pages[-1]


def make_paged_meta(n_levels: int, table_size: int, n_channels: int,
                    scales: np.ndarray, np_seed: int = 2022) -> PagedMeta:
    """Build per-level page layout.

    table_size: max entries per level (reference 2^19); pages per level =
    min((res_blocks)^3, table_size / BLOCK^3) — coarse levels are dense.
    """
    rng = np.random.default_rng(np_seed + 7)
    max_pages = max(table_size // (BLOCK ** 3), 1)
    n_pages, offsets, a_c, b_c, dense, biases = [], [], [], [], [], []
    off = 0
    for lvl in range(n_levels):
        res_blocks = int(np.ceil(4.0 * float(scales[lvl]) / BLOCK)) + 1
        if res_blocks ** 3 <= max_pages:
            n_p = res_blocks ** 3
            a_c.append(res_blocks * res_blocks)
            b_c.append(res_blocks)
            dense.append(True)
            biases.append(np.full(3, 2.0 * float(scales[lvl]),
                                  dtype=np.float32))
        else:
            n_p = max_pages
            # random odd constants; uint32 wraparound composes with the
            # power-of-two page modulus
            a_c.append(int(rng.integers(1 << 20, 1 << 31)) | 1)
            b_c.append(int(rng.integers(1 << 20, 1 << 31)) | 1)
            dense.append(False)
            biases.append(
                rng.uniform(100.0, 1100.0, 3).astype(np.float32))
        n_pages.append(n_p)
        offsets.append(off)
        off += n_p
    return PagedMeta(
        n_levels=n_levels, n_channels=n_channels,
        n_pages=tuple(n_pages), page_offset=tuple(offsets),
        a=np.array(a_c, dtype=np.uint32), b=np.array(b_c, dtype=np.uint32),
        dense=tuple(dense),
        scales=np.asarray(scales, dtype=np.float32),
        biases=np.stack(biases).astype(np.float32))


def init_pages(key: jax.Array, meta: PagedMeta) -> jnp.ndarray:
    """[P_total, C, 4, 4, 4] feature pages ~ (U*0.2-1)*1e-4 (reference
    src/hash_3d_anchored.cpp:24)."""
    shape = (meta.total_pages, meta.n_channels, BLOCK, BLOCK, BLOCK)
    return (jax.random.uniform(key, shape) * 0.2 - 1.0) * 1e-4


def halo_pages(pages: jnp.ndarray, meta: PagedMeta) -> jnp.ndarray:
    """Materialize haloed page rows [P_total, C * 128].

    Three roll+concat passes per level (additive hash => the +x/+y/+z
    block neighbor of page p is page p+A / p+B / p+1). Differentiable
    dense op; its transpose is rolls too.
    """
    out = []
    for lvl in range(meta.n_levels):
        off = meta.page_offset[lvl]
        n_p = meta.n_pages[lvl]
        t = pages[off:off + n_p]                     # [P, C, 4, 4, 4]
        a = int(meta.a[lvl]) % n_p
        b = int(meta.b[lvl]) % n_p
        # z halo: page p+1 contributes its z=0 plane
        hz = jnp.concatenate(
            [t, jnp.roll(t, -1, axis=0)[..., :, :, :1]], axis=4)
        # y halo: page p+B contributes its y=0 plane (already z-haloed)
        hy = jnp.concatenate(
            [hz, jnp.roll(hz, -b, axis=0)[..., :, :1, :]], axis=3)
        # x halo: page p+A contributes its x=0 plane
        hx = jnp.concatenate(
            [hy, jnp.roll(hy, -a, axis=0)[..., :1, :, :]], axis=2)
        out.append(hx)
    h = jnp.concatenate(out, axis=0)                 # [P_total, C, 5,5,5]
    h = h.reshape(meta.total_pages, meta.n_channels, PAGE_CELLS)
    h = jnp.pad(h, ((0, 0), (0, 0), (0, ROW_PAD - PAGE_CELLS)))
    return h.reshape(meta.total_pages, meta.n_channels * ROW_PAD)


def _page_indices(points: jnp.ndarray, meta: PagedMeta
                  ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per (point, level): global page index, in-block local cell coords,
    trilinear fractions.

    Returns (page_idx [N, L] int32, local [N, L, 3] int32 in [0, BLOCK),
    frac [N, L, 3] float32).
    """
    scales = jnp.asarray(meta.scales)
    biases = jnp.asarray(meta.biases)
    pt = (points[:, None, :] * scales[None, :, None]
          + biases[None, :, :])                         # [N, L, 3]
    f = jnp.floor(pt)
    frac = (pt - f).astype(jnp.float32)
    ip = f.astype(jnp.int32)                            # cell coords
    blk = ip >> 2                                       # block coords
    local = (ip & (BLOCK - 1)).astype(jnp.int32)

    a = jnp.asarray(meta.a)
    b = jnp.asarray(meta.b)
    xb = blk[..., 0].astype(jnp.uint32)
    yb = blk[..., 1].astype(jnp.uint32)
    zb = blk[..., 2].astype(jnp.uint32)
    n_pages = jnp.asarray(np.array(meta.n_pages, dtype=np.uint32))
    raw = xb * a[None, :] + yb * b[None, :] + zb        # wraps mod 2^32
    page = (raw % n_pages[None, :]).astype(jnp.int32)
    offs = jnp.asarray(np.array(meta.page_offset, dtype=np.int32))
    return page + offs[None, :], local, frac


def _weight_row(local: jnp.ndarray, frac: jnp.ndarray,
                dtype=jnp.float32) -> jnp.ndarray:
    """Trilinear weights as a lane-padded row.

    local/frac: [..., 3] -> [..., 128] where slot s = x*25 + y*5 + z of
    the haloed page gets w = wx[x]*wy[y]*wz[z], with
    w_ax = (1-f)*[s==l] + f*[s==l+1] per axis.
    """
    s5 = jnp.arange(HALO, dtype=jnp.int32)

    def axis_w(lax_, fax_):
        loc = lax_[..., None]
        fr = fax_[..., None]
        return (jnp.where(s5 == loc, 1.0 - fr, 0.0)
                + jnp.where(s5 == loc + 1, fr, 0.0))    # [..., 5]

    wx = axis_w(local[..., 0], frac[..., 0])
    wy = axis_w(local[..., 1], frac[..., 1])
    wz = axis_w(local[..., 2], frac[..., 2])
    # expand to 125 lanes by static repeat/tile along the last axis
    wx125 = jnp.repeat(wx, HALO * HALO, axis=-1)         # [..., 125]
    wy125 = jnp.tile(jnp.repeat(wy, HALO, axis=-1), (1,) * (wy.ndim - 1)
                     + (HALO,))
    wz125 = jnp.tile(wz, (1,) * (wz.ndim - 1) + (HALO * HALO,))
    w = (wx125 * wy125 * wz125).astype(dtype)
    pad = [(0, 0)] * (w.ndim - 1) + [(0, ROW_PAD - PAGE_CELLS)]
    return jnp.pad(w, pad)                               # [..., 128]


def _contract(rows: jnp.ndarray, w_row: jnp.ndarray,
              n_channels: int) -> jnp.ndarray:
    """rows [N, L, C*128] (bf16) x w_row [N, L, 128] -> [N, L, C] f32.

    Batched matvec over the 128-lane axis (dot_general accumulates in
    f32 without materializing an f32 copy of the rows).
    """
    n, l = rows.shape[0], rows.shape[1]
    r = rows.reshape(n, l, n_channels, ROW_PAD)
    return jax.lax.dot_general(
        r, w_row.astype(rows.dtype),
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)              # [N, L, C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _encode_rows(haloed: jnp.ndarray, page_idx: jnp.ndarray,
                 local_frac: jnp.ndarray, n_channels: int,
                 page_layout: tuple[tuple[int, int], ...],
                 use_pallas: bool) -> jnp.ndarray:
    """Gather page rows + contract.

    haloed: [P_total, C*128]; local_frac packs (local as float, frac) as
    [N, L, 6] float32 so the custom_vjp has one differentiable tensor
    argument for the point-gradient path. With use_pallas, the
    contraction runs as a Pallas kernel (kernels/trilinear.py) that
    builds the trilinear weights in-register; otherwise a pure-jnp
    formulation (slower: XLA materializes the weight rows).
    """
    local = local_frac[..., 0:3].astype(jnp.int32)
    frac = local_frac[..., 3:6]
    rows = jnp.take(haloed, page_idx, axis=0)
    n, l = page_idx.shape
    if use_pallas:
        from f2nerf_tpu.kernels.trilinear import contract_fwd
        feat = contract_fwd(rows.reshape(n, -1), local, frac, l,
                            n_channels)
        return feat.reshape(n, l, n_channels)
    w_row = _weight_row(local, frac, dtype=haloed.dtype)
    return _contract(rows, w_row, n_channels)


def _encode_rows_fwd(haloed, page_idx, local_frac, n_channels,
                     page_layout, use_pallas):
    out = _encode_rows(haloed, page_idx, local_frac, n_channels,
                       page_layout, use_pallas)
    return out, (haloed, page_idx, local_frac)


def _encode_rows_bwd(n_channels, page_layout, use_pallas, res, g):
    haloed, page_idx, local_frac = res
    local = local_frac[..., 0:3].astype(jnp.int32)
    frac = local_frac[..., 3:6]
    n, l = page_idx.shape

    if use_pallas:
        from f2nerf_tpu.kernels.trilinear import (contract_bwd_frac,
                                                  contract_bwd_rows)
        g32 = g.reshape(n, l * n_channels).astype(jnp.float32)
        d_rows = contract_bwd_rows(
            local, frac, g32, l, n_channels, haloed.dtype).reshape(
            n, l, n_channels * ROW_PAD)
        # d_frac (and its row re-fetch) is DCE'd unless point gradients
        # are actually consumed (pose optimization)
        rows = jnp.take(haloed, page_idx, axis=0)
        d_frac = contract_bwd_frac(rows.reshape(n, -1), local, frac,
                                   g32, l, n_channels)
    else:
        rows = jnp.take(haloed, page_idx, axis=0)         # re-fetch
        w_row = _weight_row(local, frac, dtype=jnp.float32)  # [N, L, 128]
        g32 = g.astype(jnp.float32)                          # [N, L, C]
        d_rows = (g32[..., None] * w_row[:, :, None, :]).reshape(
            n, l, n_channels * ROW_PAD).astype(haloed.dtype)
        r = rows.reshape(n, l, n_channels, ROW_PAD)
        d_w = jax.lax.dot_general(                           # [N, L, 128]
            g.astype(rows.dtype), r,
            dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)

        def wfn(fr):
            return _weight_row(local, fr, dtype=jnp.float32)

        _, w_vjp = jax.vjp(wfn, frac)
        (d_frac,) = w_vjp(d_w)

    # deterministic page-row reduction (not XLA scatter); split per level
    # — segment_sum's row rate degrades ~1.6x at large segment counts,
    # and each level's indices already live in a contiguous page range
    d_haloed_parts = []
    for lvl, (off, n_p) in enumerate(page_layout):
        d_haloed_parts.append(jax.ops.segment_sum(
            d_rows[:, lvl].astype(jnp.float32),
            page_idx[:, lvl] - off, num_segments=n_p))
    d_haloed = jnp.concatenate(d_haloed_parts, axis=0)

    d_local_frac = jnp.concatenate(
        [jnp.zeros_like(d_frac), d_frac], axis=-1)
    return d_haloed.astype(haloed.dtype), None, d_local_frac


_encode_rows.defvjp(_encode_rows_fwd, _encode_rows_bwd)


def paged_encode(points: jnp.ndarray, pages: jnp.ndarray,
                 meta: PagedMeta, compute_dtype=jnp.bfloat16,
                 chunk: int = 65536,
                 use_pallas: bool | None = None) -> jnp.ndarray:
    """Encode points against the paged hash grid.

    Args:
      points: [N, 3] contracted points.
      pages: [P_total, C, 4, 4, 4] canonical feature pages (fp32 master).
      meta: from :func:`make_paged_meta`.
      compute_dtype: dtype of the materialized haloed table (the
        bf16-compute analogue of the reference's fp16 kernel).
      chunk: points per processing chunk (bounds the [chunk, L, C*128]
        fetched-rows intermediate).

    Returns:
      [N, L*C] float32 features, channel-minor per level (matches the
      reference output layout, src/hash_3d_anchored.cu:79-93).
    """
    n = points.shape[0]
    l, c = meta.n_levels, meta.n_channels
    if use_pallas is None:
        import os
        use_pallas = (jax.default_backend() == "tpu"
                      and not os.environ.get("F2_NO_PALLAS"))
    haloed = halo_pages(pages, meta).astype(compute_dtype)

    page_idx, local, frac = _page_indices(points, meta)
    local_frac = jnp.concatenate(
        [local.astype(jnp.float32), frac], axis=-1)     # [N, L, 6]

    if n <= chunk:
        # pad to the pallas tile size (N*L rows must tile by 1024)
        tile = 1024 if use_pallas else 8
        pad = (-n) % tile
        if pad:
            page_idx = jnp.pad(page_idx, ((0, pad), (0, 0)))
            local_frac = jnp.pad(local_frac, ((0, pad), (0, 0), (0, 0)))
        feat = _encode_rows(haloed, page_idx, local_frac, c,
                            tuple(zip(meta.page_offset, meta.n_pages)),
                            use_pallas)
        return feat.reshape(n + pad, l * c)[:n]

    pad = (-n) % chunk
    if pad:
        page_idx = jnp.pad(page_idx, ((0, pad), (0, 0)))
        local_frac = jnp.pad(local_frac, ((0, pad), (0, 0), (0, 0)))
    n_chunks = (n + pad) // chunk

    def chunk_fn(args):
        pi, lf = args
        return _encode_rows(haloed, pi, lf, c,
                            tuple(zip(meta.page_offset, meta.n_pages)),
                            use_pallas)

    feat = jax.lax.map(
        chunk_fn, (page_idx.reshape(n_chunks, chunk, l),
                   local_frac.reshape(n_chunks, chunk, l, 6)))
    return feat.reshape(n + pad, l * c)[:n]
