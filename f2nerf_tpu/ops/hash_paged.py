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
  trilinear interpolation contracts each row against per-point weights
  (Pallas kernel building the weights in-register, kernels/trilinear.py).
* Backward (custom VJP): cotangents w.r.t. the fetched rows reduce into
  pages with `jax.ops.segment_sum` — deterministic across runs and
  shard counts (BASELINE.md requirement), replacing both the
  reference's fp16 atomicAdd race (src/hash_3d_anchored.cu:135-142)
  and XLA's serial scatter. Point gradients come from the analytic
  trilinear derivative (equivalent to the reference's corner-sign
  gradient, src/hash_3d_anchored.cu:122-133).

The encode processes each level as its own ROW STREAM (gather ->
kernel -> segment_sum, all [N, C*128]-shaped): profiling showed a
combined [N, L, C*128] layout spends ~20% of the step in pure layout
copies (XLA picks an L-minor layout for the multi-level gather, then
must transpose for the kernels).

Total parameter capacity (sum over levels of pages*64*C) is configured
to match the reference's 2^19 x 16 x 2 pool.
"""

from __future__ import annotations

import functools
import math
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


def _page_indices_lm(points: jnp.ndarray, meta: PagedMeta
                     ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per (level, point): global page index, in-block local cell
    coords, trilinear fractions — LEVEL-MAJOR so each level's slice is
    a contiguous [N, ...] array (per-level slices of an [N, L, 3]
    layout turn into slow strided DMAs on TPU).

    Returns (page_idx [L, N] int32, local [L, N, 3] int32 in [0, BLOCK),
    frac [L, N, 3] float32).
    """
    scales = jnp.asarray(meta.scales)
    biases = jnp.asarray(meta.biases)
    pt = (points[None, :, :] * scales[:, None, None]
          + biases[:, None, :])                         # [L, N, 3]
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
    raw = xb * a[:, None] + yb * b[:, None] + zb        # wraps mod 2^32
    page = (raw % n_pages[:, None]).astype(jnp.int32)
    offs = jnp.asarray(np.array(meta.page_offset, dtype=np.int32))
    return page + offs[:, None], local, frac


def _page_indices(points: jnp.ndarray, meta: PagedMeta
                  ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Point-major view of :func:`_page_indices_lm` (page_idx [N, L],
    local/frac [N, L, 3]) — oracle/test convenience."""
    page, local, frac = _page_indices_lm(points, meta)
    return (jnp.swapaxes(page, 0, 1), jnp.swapaxes(local, 0, 1),
            jnp.swapaxes(frac, 0, 1))


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


# ---------------------------------------------------------------------------
# Ray-coherent run-length dedup
#
# Samples along a ray visit coarse-level pages in long runs: the block
# coordinate of a (contracted) ray path is piecewise-constant over the
# sample axis, changing only at block-boundary crossings. At level scale
# s over a march of length m, the number of page-runs per ray is bounded
# by 1 + crossings <= 1 + sqrt(3)*m*s/BLOCK + 3 (total variation per
# axis of the 1-Lipschitz contracted path, Cauchy-Schwarz across axes,
# +1 rounding per axis). So instead of fetching one row per *sample*, the
# dedup path fetches one row per *run* (a static per-level budget B_l
# bounds the run count) and expands runs back to samples with a one-hot
# batched matmul on the MXU — compute we have in abundance, spent to
# avoid row fetches we do not. The backward similarly reduces sample
# cotangents into run cotangents with one matmul, shrinking the
# deterministic segment_sum from R*S rows to R*B_l rows.
#
# Exactness: when the run count never exceeds B_l (guaranteed by the
# bound above for any sampler whose t is monotone over valid samples,
# plus slack for the occ sampler's invalid-slot suffix), the expanded
# rows are bitwise identical to per-sample gathers — the one-hot matmul
# has exactly one nonzero term per output row. tests/test_hash.py checks
# this, including adversarial diagonal rays.
# ---------------------------------------------------------------------------


def dedup_budgets(meta: PagedMeta, s_per_ray: int, march: float,
                  max_frac: float = 0.6,
                  occ: tuple[int, int, int] | None = None
                  ) -> tuple[int, ...]:
    """Per-level run budgets (0 = level not deduped).

    A level is deduped only when its worst-case budget is at most
    ``max_frac * s_per_ray`` — beyond that the fetch saving no longer
    pays for the expansion matmuls.

    Two worst-case run bounds, minimum taken:

    * march bound: 1 + total block-boundary crossings of the contracted
      ray path (per-axis TV <= march since contraction is 1-Lipschitz;
      Cauchy-Schwarz across axes) + slack for per-axis rounding and the
      contraction's few non-monotone pieces.
    * occ-slot bound (``occ=(keep, sps, n_segments)``): the occupancy
      sampler emits ``keep`` slots of ``sps`` samples, each slot walking
      one ``march/n_segments``-long segment (invalid slots re-walk
      segment 0 — same structure). A run boundary is an adjacent-PAIR
      page change, so each slot contributes at most
      ``min(sps-1, 3*(floor(seg_len*scale/BLOCK)+1))`` boundaries (a
      slot shorter than a block can straddle at most one boundary per
      axis — plus rounding when it spans blocks), each between-slot jump
      contributes exactly one, and +12 covers extra crossings from the
      contraction's per-axis non-monotone pieces. For mid levels the
      march bound explodes (the slot structure is what bounds the walk,
      not the full march) while this stays ~keep*3.
    """
    out = []
    for lvl in range(meta.n_levels):
        scale = float(meta.scales[lvl])
        b = int(np.ceil(np.sqrt(3.0) * march * scale / BLOCK)) + 8
        if occ is not None:
            keep, sps, n_seg = occ
            seg_len = march / n_seg
            per_slot = min(sps - 1,
                           3 * (int(seg_len * scale / BLOCK) + 1))
            b_occ = 1 + (keep - 1) + keep * per_slot + 12
            b = min(b, b_occ)
        b = ((b + 7) // 8) * 8
        out.append(b if b <= max_frac * s_per_ray else 0)
    return tuple(out)


def compute_runs(page_idx_l: jnp.ndarray, budget: int, fill: int
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run-length structure of one level's page indices along rays.

    Args:
      page_idx_l: [R, S] global page index per sample.
      budget: static max runs per ray (run ids clamp here; see the
        exactness bound above for why they never do for honest budgets).
      fill: page index assigned to unused run slots (the level's first
        page — any valid row; its fetch result is never selected).

    Returns:
      run_id [R, S] int32 in [0, budget), run_page [R, budget] int32.
    """
    r = page_idx_l.shape[0]
    chg = (page_idx_l[:, 1:] != page_idx_l[:, :-1]).astype(jnp.int32)
    run_id = jnp.concatenate(
        [jnp.zeros((r, 1), jnp.int32), jnp.cumsum(chg, axis=1)], axis=1)
    run_id = jnp.minimum(run_id, budget - 1)
    b_iota = jnp.arange(budget, dtype=jnp.int32)
    # All samples of a run share the page, so max == the page; empty run
    # slots keep `fill` (callers pass the level's FIRST page, which is
    # also the level's minimum global index — required: max() would
    # otherwise return `fill` for runs whose page < fill). A vmapped
    # binary search over run starts was tried here (round 3) and is
    # 3x SLOWER end-to-end on TPU (encode fwd 42 -> 130 ms at the dense
    # point; jnp.searchsorted lowers to per-element scans) — the dense
    # [R, S, B] where+max vectorizes, the "cheaper" search does not.
    run_page = jnp.max(
        jnp.where(run_id[:, :, None] == b_iota, page_idx_l[:, :, None],
                  fill), axis=1)
    return run_id, run_page


def _run_onehot(run_id_l: jnp.ndarray, budget: int, dtype) -> jnp.ndarray:
    """[R, S] run ids -> [R, S, B] one-hot selection matrix."""
    return (run_id_l[:, :, None]
            == jnp.arange(budget, dtype=jnp.int32)).astype(dtype)


# ---------------------------------------------------------------------------
# Per-level row-stream encode core (all index arrays LEVEL-MAJOR)
# ---------------------------------------------------------------------------


def _fetch_level(haloed, page_idx, run_id, run_pages, lvl, di, doff,
                 budget, s_per_ray):
    """One level's per-sample rows [N, cw]: plain gather, or run gather +
    one-hot MXU expansion when the level is deduped."""
    if not budget:
        # mode='clip': page indices are in-range by construction; the
        # default 'fill' mode adds a per-row validity select over every
        # fetched [N, cw] block (measured ~6.6 ms/step at the flagship)
        return jnp.take(haloed, page_idx[lvl], axis=0, mode="clip")
    n = page_idx.shape[1]
    rp = run_pages[:, doff:doff + budget]                # [R, B]
    rows_d = jnp.take(haloed, rp, axis=0, mode="clip")  # [R, B, cw]
    onehot = _run_onehot(run_id[di], budget, haloed.dtype)
    rows = jax.lax.dot_general(                          # [R, S, cw]
        onehot, rows_d,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))))
    return rows.reshape(n, -1)


def _contract_level(rows_l, local_l, frac_l, n_channels, use_pallas):
    """rows_l [N, cw] x per-point trilinear weights -> [N, C] f32."""
    if use_pallas:
        from f2nerf_tpu.kernels.trilinear import contract_fwd
        return contract_fwd(rows_l, local_l[:, None, :],
                            frac_l[:, None, :], 1, n_channels)
    w_row = _weight_row(local_l, frac_l, dtype=rows_l.dtype)  # [N, 128]
    n = rows_l.shape[0]
    return jax.lax.dot_general(
        rows_l.reshape(n, n_channels, ROW_PAD), w_row,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [N, C]


def _drows_level(g_l, local_l, frac_l, n_channels, use_pallas, dtype):
    """Cotangent w.r.t. one level's rows: [N, cw] (rows not needed)."""
    if use_pallas:
        from f2nerf_tpu.kernels.trilinear import contract_bwd_rows
        return contract_bwd_rows(local_l[:, None, :], frac_l[:, None, :],
                                 g_l.astype(jnp.float32), 1, n_channels,
                                 dtype)
    w_row = _weight_row(local_l, frac_l, dtype=jnp.float32)
    n = g_l.shape[0]
    return (g_l.astype(jnp.float32)[:, :, None]
            * w_row[:, None, :]).reshape(
        n, n_channels * ROW_PAD).astype(dtype)


def _dfrac_level(rows_l, local_l, frac_l, g_l, n_channels, use_pallas):
    """Point-gradient path for one level: [N, 3] (needs the rows;
    DCE'd in training where point gradients are unused)."""
    if use_pallas:
        from f2nerf_tpu.kernels.trilinear import contract_bwd_frac
        return contract_bwd_frac(rows_l, local_l[:, None, :],
                                 frac_l[:, None, :],
                                 g_l.astype(jnp.float32), 1,
                                 n_channels)[:, 0]
    n = rows_l.shape[0]
    d_w = jax.lax.dot_general(                           # [N, 128]
        g_l.astype(rows_l.dtype), rows_l.reshape(n, n_channels, ROW_PAD),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    def wfn(fr):
        return _weight_row(local_l, fr, dtype=jnp.float32)

    _, w_vjp = jax.vjp(wfn, frac_l)
    (d_frac,) = w_vjp(d_w)
    return d_frac


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _encode_core(haloed: jnp.ndarray, page_idx: jnp.ndarray,
                 local_frac: jnp.ndarray, run_id: jnp.ndarray,
                 run_pages: jnp.ndarray, n_channels: int,
                 page_layout: tuple[tuple[int, int], ...],
                 use_pallas: bool, budgets: tuple[int, ...],
                 s_per_ray: int, point_grads: bool = True) -> jnp.ndarray:
    """Level-major encode: per level, gather (or dedup-expand) rows and
    contract against trilinear weights.

    haloed [P, C*128]; page_idx [L, N]; local_frac [L, N, 6] (local as
    float + frac); run_id [n_dedup, R, S] and run_pages
    [R, sum(budgets)] (zero-size when nothing is deduped; N = R *
    s_per_ray otherwise). Returns [N, L*C] float32.
    """
    feats = []
    di = doff = 0
    for lvl, b in enumerate(budgets):
        rows_l = _fetch_level(haloed, page_idx, run_id, run_pages, lvl,
                              di, doff, b, s_per_ray)
        local_l = local_frac[lvl, :, 0:3].astype(jnp.int32)
        frac_l = local_frac[lvl, :, 3:6]
        feats.append(_contract_level(rows_l, local_l, frac_l,
                                     n_channels, use_pallas))
        if b:
            di += 1
            doff += b
    return jnp.concatenate(feats, axis=-1)               # [N, L*C]


def _encode_core_fwd(haloed, page_idx, local_frac, run_id, run_pages,
                     n_channels, page_layout, use_pallas, budgets,
                     s_per_ray, point_grads):
    out = _encode_core(haloed, page_idx, local_frac, run_id, run_pages,
                       n_channels, page_layout, use_pallas, budgets,
                       s_per_ray, point_grads)
    return out, (haloed, page_idx, local_frac, run_id, run_pages)


def _encode_core_bwd(n_channels, page_layout, use_pallas, budgets,
                     s_per_ray, point_grads, res, g):
    haloed, page_idx, local_frac, run_id, run_pages = res
    n = page_idx.shape[1]
    r = n // s_per_ray if s_per_ray else n

    d_haloed_parts = []
    d_frac_cols = []
    di = doff = 0
    for lvl, (off, n_p) in enumerate(page_layout):
        b = budgets[lvl]
        g_l = g[:, lvl * n_channels:(lvl + 1) * n_channels]
        local_l = local_frac[lvl, :, 0:3].astype(jnp.int32)
        frac_l = local_frac[lvl, :, 3:6]
        d_rows_l = _drows_level(g_l, local_l, frac_l, n_channels,
                                use_pallas, haloed.dtype)
        if b:
            # compress sample cotangents into run cotangents (MXU), then
            # a much smaller deterministic segment_sum — in the compute
            # dtype on TPU (same rationale as the non-dedup branch
            # below; the f32 matmul output would double the scattered
            # bytes for nothing)
            onehot = _run_onehot(run_id[di], b, d_rows_l.dtype)
            d_runs = jax.lax.dot_general(                # [R, B, cw]
                onehot, d_rows_l.reshape(r, s_per_ray, -1),
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if use_pallas:
                d_runs = d_runs.astype(haloed.dtype)
            rp = run_pages[:, doff:doff + b]
            d_haloed_parts.append(jax.ops.segment_sum(
                d_runs.reshape(r * b, -1), (rp - off).reshape(-1),
                num_segments=n_p).astype(haloed.dtype))
            di += 1
            doff += b
        else:
            # On TPU, accumulate page cotangents in the compute dtype:
            # the across-chunk scan already sums them in haloed.dtype,
            # and bf16 keeps f32's exponent range (no loss-scaling
            # needed, unlike the reference's fp16 atomics at
            # src/hash_3d_anchored.cu:190-215) while halving the
            # segment_sum's bandwidth. On CPU an emulated-bf16 scatter
            # is pathologically slow (stalls the virtual-device mesh's
            # collectives), so accumulate f32 there; fp32 mode is
            # exact everywhere.
            acc = d_rows_l if use_pallas else d_rows_l.astype(jnp.float32)
            d_haloed_parts.append(jax.ops.segment_sum(
                acc, page_idx[lvl] - off, num_segments=n_p))
        if point_grads:
            # point-gradient path (re-fetches rows). XLA fails to DCE
            # this through the transposed chunk loop (measured: the
            # re-fetch gathers + frac kernels stayed live in the train
            # step at ~20 ms), so callers that never differentiate
            # points pass point_grads=False explicitly.
            rows_l = _fetch_level(haloed, page_idx, run_id, run_pages,
                                  lvl, di - (1 if b else 0), doff - b, b,
                                  s_per_ray)
            d_frac_cols.append(_dfrac_level(rows_l, local_l, frac_l,
                                            g_l, n_channels, use_pallas))
    d_haloed = jnp.concatenate(d_haloed_parts, axis=0)
    if point_grads:
        d_frac = jnp.stack(d_frac_cols, axis=0)          # [L, N, 3]
        d_local_frac = jnp.concatenate(
            [jnp.zeros_like(d_frac), d_frac], axis=-1)
    else:
        d_local_frac = jnp.zeros_like(local_frac)
    return (d_haloed.astype(haloed.dtype), None, d_local_frac, None,
            None)


_encode_core.defvjp(_encode_core_fwd, _encode_core_bwd)


def _no_dedup_dummies():
    return (jnp.zeros((0, 1, 1), jnp.int32), jnp.zeros((1, 0), jnp.int32))


def _resolve_pallas(use_pallas):
    if use_pallas is None:
        import os
        return (jax.default_backend() == "tpu"
                and not os.environ.get("F2_NO_PALLAS"))
    return use_pallas


def paged_encode(points: jnp.ndarray, pages: jnp.ndarray,
                 meta: PagedMeta, compute_dtype=jnp.bfloat16,
                 chunk: int = 65536,
                 use_pallas: bool | None = None,
                 point_grads: bool = True) -> jnp.ndarray:
    """Encode points against the paged hash grid.

    Args:
      points: [N, 3] contracted points.
      pages: [P_total, C, 4, 4, 4] canonical feature pages (fp32 master).
      meta: from :func:`make_paged_meta`.
      compute_dtype: dtype of the materialized haloed table (the
        bf16-compute analogue of the reference's fp16 kernel).
      chunk: points per processing chunk (bounds the per-level [chunk,
        C*128] fetched-rows intermediates).

    Returns:
      [N, L*C] float32 features, channel-minor per level (matches the
      reference output layout, src/hash_3d_anchored.cu:79-93).
    """
    n = points.shape[0]
    l, c = meta.n_levels, meta.n_channels
    use_pallas = _resolve_pallas(use_pallas)
    haloed = halo_pages(pages, meta).astype(compute_dtype)
    layout = tuple(zip(meta.page_offset, meta.n_pages))
    budgets = (0,) * l
    run_id, run_pages = _no_dedup_dummies()

    page_idx, local, frac = _page_indices_lm(points, meta)
    local_frac = jnp.concatenate(
        [local.astype(jnp.float32), frac], axis=-1)      # [L, N, 6]

    if use_pallas:
        from f2nerf_tpu.kernels.trilinear import TILE
        tile = TILE
    else:
        tile = 8
    if n <= chunk:
        pad = (-n) % tile
        if pad:
            page_idx = jnp.pad(page_idx, ((0, 0), (0, pad)))
            local_frac = jnp.pad(local_frac, ((0, 0), (0, pad), (0, 0)))
        feat = _encode_core(haloed, page_idx, local_frac, run_id,
                            run_pages, c, layout, use_pallas, budgets, 0,
                            point_grads)
        return feat[:n]

    chunk = max(tile, chunk - chunk % tile)
    pad = (-n) % chunk
    if pad:
        page_idx = jnp.pad(page_idx, ((0, 0), (0, pad)))
        local_frac = jnp.pad(local_frac, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (n + pad) // chunk

    def chunk_fn(args):
        pi, lf = args
        return _encode_core(haloed, pi, lf, run_id, run_pages, c,
                            layout, use_pallas, budgets, 0, point_grads)

    feat = jax.lax.map(
        chunk_fn,
        (page_idx.reshape(l, n_chunks, chunk).swapaxes(0, 1),
         local_frac.reshape(l, n_chunks, chunk, 6).swapaxes(0, 1)))
    return feat.reshape(n + pad, l * c)[:n]


def paged_encode_rays(points: jnp.ndarray, pages: jnp.ndarray,
                      meta: PagedMeta, budgets: tuple[int, ...],
                      compute_dtype=jnp.bfloat16, chunk: int = 65536,
                      use_pallas: bool | None = None,
                      point_grads: bool = True) -> jnp.ndarray:
    """Ray-structured encode with coarse-level run dedup.

    Args:
      points: [R, S, 3] contracted sample points, t monotone over valid
        samples along axis 1 (both samplers guarantee this).
      budgets: per-level run budgets from :func:`dedup_budgets`.

    Returns:
      [R, S, L*C] float32 features (same layout as paged_encode).
    """
    r, s = points.shape[0], points.shape[1]
    l, c = meta.n_levels, meta.n_channels
    use_pallas = _resolve_pallas(use_pallas)
    if not any(budgets):
        flat = paged_encode(points.reshape(r * s, 3), pages, meta,
                            compute_dtype=compute_dtype, chunk=chunk,
                            use_pallas=use_pallas,
                            point_grads=point_grads)
        return flat.reshape(r, s, l * c)
    haloed = halo_pages(pages, meta).astype(compute_dtype)
    layout = tuple(zip(meta.page_offset, meta.n_pages))
    dedup_lvls = [lvl for lvl, b in enumerate(budgets) if b]

    # index math on the full batch (identical shapes — and therefore
    # identical XLA FMA fusion — to the flat path, keeping dedup
    # bitwise-equal to it regardless of chunking)
    page_idx, local, frac = _page_indices_lm(points.reshape(r * s, 3),
                                             meta)
    local_frac = jnp.concatenate(
        [local.astype(jnp.float32), frac], axis=-1)      # [L, R*S, 6]
    rid_cols, rp_cols = [], []
    for lvl in dedup_lvls:
        rid, rp = compute_runs(page_idx[lvl].reshape(r, s),
                               budgets[lvl], fill=meta.page_offset[lvl])
        rid_cols.append(rid)
        rp_cols.append(rp)
    run_id = jnp.stack(rid_cols, axis=0)                 # [Ld, R, S]
    run_pages = jnp.concatenate(rp_cols, axis=-1)        # [R, sumB]

    # rays per chunk: bound fetched-rows memory AND satisfy the pallas
    # tile rule (rows per chunk R_c*S must divide by the kernel TILE)
    chunk_rays = max(1, chunk // s)
    if use_pallas:
        from f2nerf_tpu.kernels.trilinear import TILE
        while (chunk_rays * s) % TILE:
            chunk_rays += 1
        tile_rays = TILE // math.gcd(TILE, s)
    else:
        tile_rays = 1

    def encode_chunk(args):
        pi, lf, rid, rp = args
        rc = rid.shape[1]
        return _encode_core(haloed, pi.reshape(l, rc * s),
                            lf.reshape(l, rc * s, 6), rid, rp, c,
                            layout, use_pallas, budgets, s, point_grads)

    page_idx = page_idx.reshape(l, r, s)
    local_frac = local_frac.reshape(l, r, s, 6)
    pad = (-r) % (tile_rays if r <= chunk_rays else chunk_rays)

    def padr(x, axis):
        if not pad:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    if r <= chunk_rays:
        feat = encode_chunk((padr(page_idx, 1), padr(local_frac, 1),
                             padr(run_id, 1), padr(run_pages, 0)))
        return feat.reshape(r + pad, s, l * c)[:r]

    n_chunks = (r + pad) // chunk_rays

    def reshard(x, axis):
        x = padr(x, axis)
        shape = (x.shape[:axis] + (n_chunks, chunk_rays)
                 + x.shape[axis + 1:])
        x = x.reshape(shape)
        return jnp.moveaxis(x, axis, 0)

    feat = jax.lax.map(
        encode_chunk, (reshard(page_idx, 1), reshard(local_frac, 1),
                       reshard(run_id, 1), reshard(run_pages, 0)))
    return feat.reshape(r + pad, s, l * c)[:r]
