"""Occupancy grid: density-guided ray sampling.

The original F2-NeRF / Instant-NGP method prunes empty space with an
occupancy grid (BASELINE.json north star: "occupancy-guided point
sampling"); the mounted fork stripped it and marches 1024 uniform
samples per ray (SURVEY.md overview). This module restores it in a
TPU-native form with **static shapes throughout**:

* A [G^3] density-EMA grid over the contracted domain [-2, 2)^3,
  refreshed every ``occ_update_every`` steps by querying the field at
  jittered cell centers (ema = max(decay * ema, sigma)).
* Sampling splits each ray into ``occ_segments`` equal segments,
  looks up each segment midpoint's occupancy bit, and keeps
  ``occ_keep`` segments chosen EVENLY among the occupied ones (rank
  r_j = floor((j+.5) * M / K)); each kept segment gets
  ``occ_samples_per_segment`` stratified samples. The
  "evenly-among-occupied" rank selection (instead of first-K) makes a
  fully-occupied grid degrade gracefully to uniform sampling, so no
  separate warmup path is needed — the grid initializes occupied.
* Rank -> segment lookup is the cumsum trick: the (r+1)-th occupied
  segment is the unique s with bit[s] & (cumsum(bit)[s] == r+1); no
  sort, no compaction, no dynamic shapes.

With defaults (128 segments over the ~4-unit march, keep 16, 8
samples each) the kept regions are sampled at the same 1/256 spacing
as the reference's dense sampler with 8x fewer field queries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from f2nerf_tpu.core.config import ModelConfig
from f2nerf_tpu.ops.contraction import contract

DOMAIN = 2.0  # contracted coords live in [-DOMAIN, DOMAIN)

# ceiling for the sigma-EMA: the field's TruncExp density is unbounded
# (exp overflows to inf for raw outputs > ~88, which Adam's high-LR
# phase can transiently produce), and a max-EMA keeps inf FOREVER
# (inf * decay == inf). An inf cell is fatal with transmittance-aware
# eligibility (estimated transmittance 0 behind it pins every ray's
# sample budget to its first segment — observed as a permanent
# PSNR-collapse death spiral). 1e4 is opaque for any practical segment
# length yet decays below threshold in ~35 refreshes.
SIGMA_EMA_MAX = 1.0e4


class OccSamples(NamedTuple):
    pts: jnp.ndarray    # [R, S, 3]
    dirs: jnp.ndarray   # [R, 3]
    dt: jnp.ndarray     # [R, S] local spacing (0 where invalid)
    t: jnp.ndarray      # [R, S]
    valid: jnp.ndarray  # [R, S] bool
    # True where the sample's segment is occupied-but-transmittance-
    # INELIGIBLE — i.e. the collision-fog region behind the estimated
    # horizon that only explore slots reach. The explore-sparsity loss
    # (train/step.py) penalizes density exactly here.
    explore: jnp.ndarray  # [R, S] bool


def init_grid(cfg: ModelConfig) -> jnp.ndarray:
    """Two-channel density grid [2, G, G, G]:

    * channel 0 — **max**-EMA, the occupancy decision (initialized
      comfortably above the threshold so training starts fully
      occupied; decays in ~8 refreshes without density support);
    * channel 1 — **mean**-EMA, the transmittance-eligibility estimate.
      A max-EMA is the wrong statistic there: a cell containing a thin
      sharp surface stores the surface's huge sigma and reads as fully
      opaque, and the bias grows as training sharpens (observed as a
      slow PSNR decay after the quality peak). The mean over jittered
      cell samples estimates the cell's EXPECTED optical depth.
      Initialized 0 = no cuts until real densities arrive.
    """
    g = cfg.occ_grid_res
    gmax = jnp.full((g, g, g), 4.0 * sigma_threshold(cfg), jnp.float32)
    return jnp.stack([gmax, jnp.zeros((g, g, g), jnp.float32)])


def _cell_index(pts: jnp.ndarray, g: int) -> jnp.ndarray:
    """Contracted [..., 3] -> flat cell index [...] (clamped)."""
    ijk = jnp.clip(((pts + DOMAIN) * (g / (2.0 * DOMAIN))).astype(
        jnp.int32), 0, g - 1)
    return (ijk[..., 0] * g + ijk[..., 1]) * g + ijk[..., 2]


def sigma_threshold(cfg: ModelConfig) -> float:
    """Density above which a segment's alpha contribution
    1 - exp(-sigma * seg_len) exceeds cfg.occ_thresh."""
    import math
    march = cfg.n_samples * cfg.sample_l
    seg_len = march / cfg.occ_segments
    return -math.log(max(1.0 - cfg.occ_thresh, 1e-9)) / seg_len


def occupancy_bits(grid: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Occupied where the density EMA beats min(alpha-threshold,
    grid mean) — the mean clamp (instant-ngp style) keeps everything
    occupied while the field is still near its uniform init (density
    ~exp(-shift) << threshold), avoiding a prune-before-training death
    spiral."""
    gmax = grid[0] if grid.ndim == 4 else grid
    thresh = jnp.minimum(sigma_threshold(cfg), jnp.mean(gmax))
    # 0.999: a uniform grid must compare >= its own (rounded) mean
    return (gmax >= thresh * 0.999).reshape(-1)


def occ_values(grid: jnp.ndarray, cfg: ModelConfig,
               warmup=False) -> jnp.ndarray:
    """[2, G^3]: channel 0 carries the occupancy decision (max-EMA where
    occupied, 0 elsewhere), channel 1 the mean-EMA sigma the sampler
    uses for transmittance-aware segment eligibility
    (cfg.occ_trans_eps). `warmup` forces everything occupied with the
    threshold density (cheap bootstrap before the field
    differentiates)."""
    gmax = grid[0] if grid.ndim == 4 else grid
    gmean = grid[1] if grid.ndim == 4 else grid
    occ = occupancy_bits(grid, cfg).reshape(gmax.shape)
    vals = jnp.where(occ, jnp.maximum(gmax, 1e-12), 0.0)
    vals = jnp.where(warmup,
                     jnp.maximum(vals, sigma_threshold(cfg)), vals)
    return jnp.stack([vals.reshape(-1),
                      jnp.minimum(gmean, SIGMA_EMA_MAX).reshape(-1)])


def update_grid(grid: jnp.ndarray, density_fn, key: jax.Array,
                cfg: ModelConfig,
                phase: jnp.ndarray | int = 0) -> jnp.ndarray:
    """EMA-update the grid by querying density at jittered cell centers.

    density_fn: [N, 3] contracted-space points -> [N] sigma. (Queries go
    through the field WITHOUT re-contracting: grid cells already live in
    contracted space; the contraction is identity inside the unit ball
    and the grid resolution outside it is coarse anyway.)

    Partial refresh (cfg.occ_refresh_phases = K > 1): each call decays
    the WHOLE max channel but re-queries density only at the cells whose
    flat index is ``phase (mod K)`` — a strided dense subset, so the
    write-back is a dynamic-update-slice instead of a scatter. Rotating
    ``phase`` covers every cell each K refreshes (the instant-ngp
    partial-update idea with deterministic coverage). A full refresh
    queries the field at G^3 points — 4x a train step's sample count at
    the flagship (measured 199 ms vs 152 ms/step) — so K=4 cuts the
    amortized cost ~4x while the grid still fully turns over every
    K * occ_update_every steps.
    """
    g = cfg.occ_grid_res
    k_sub = cfg.occ_refresh_phases
    n_cells = g * g * g
    m = n_cells // k_sub
    assert m * k_sub == n_cells, "occ_refresh_phases must divide G^3"
    cell = 2.0 * DOMAIN / g
    flat = jnp.arange(m, dtype=jnp.int32) * k_sub + phase   # [M]
    ijk = jnp.stack([flat // (g * g), (flat // g) % g, flat % g],
                    axis=-1).astype(jnp.float32)
    centers = (ijk + 0.5) * cell - DOMAIN
    jitter = (jax.random.uniform(key, centers.shape) - 0.5) * cell
    sigma = density_fn(centers + jitter)
    # clamp non-finite / exploded densities so transients DECAY instead
    # of pinning the max-EMA at inf (see SIGMA_EMA_MAX)
    sigma = jnp.where(jnp.isfinite(sigma), sigma, SIGMA_EMA_MAX)
    sigma = jnp.minimum(sigma, SIGMA_EMA_MAX)                # [M]
    gmax = grid[0] if grid.ndim == 4 else grid
    gm = (gmax * cfg.occ_decay).reshape(m, k_sub)
    new_max = gm.at[:, phase].max(sigma).reshape(g, g, g)
    if grid.ndim != 4:          # legacy single-channel grid
        return new_max
    a = cfg.occ_mean_ema
    gmean = grid[1].reshape(m, k_sub)
    col = gmean[:, phase] * (1.0 - a) + sigma * a
    new_mean = gmean.at[:, phase].set(col).reshape(g, g, g)
    return jnp.stack([new_max, new_mean])


def sample_rays_occ(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    vals: jnp.ndarray, cfg: ModelConfig,
                    key: jax.Array | None) -> OccSamples:
    """Occupancy-guided stratified sampling (static shapes).

    Args:
      rays_o/rays_d: [R, 3] (dirs normalized here).
      vals: [G^3] from :func:`occ_values` — sigma-EMA, 0 where
        unoccupied (bool bits also work: eligibility degrades to plain
        occupancy).
      key: PRNG for stratified jitter (None = midpoint / VALIDATE).
    """
    r = rays_o.shape[0]
    n_seg = cfg.occ_segments
    keep = cfg.occ_keep
    sps = cfg.occ_samples_per_segment
    march = cfg.n_samples * cfg.sample_l          # total march length
    seg_len = march / n_seg

    dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    # 1. occupancy of each segment (midpoint lookup, contracted space).
    # The march window is [sample_near, sample_near + march): the near
    # offset excises the single-view billboard shell in front of each
    # camera (see ModelConfig.sample_near).
    t_mid = (cfg.sample_near
             + (jnp.arange(n_seg, dtype=jnp.float32) + 0.5) * seg_len)
    mid = rays_o[:, None, :] + dirs[:, None, :] * t_mid[None, :, None]
    cell = _cell_index(contract(mid), cfg.occ_grid_res)  # [R, n_seg]
    if vals.ndim == 2:          # [2, G^3] from occ_values — one gather
        both = jnp.take(vals.astype(jnp.float32), cell, axis=1,
                        mode="clip")
        occ_seg, elig_seg = both[0], both[1]
    else:                       # legacy single channel / bool bits
        occ_seg = elig_seg = jnp.take(vals.astype(jnp.float32), cell,
                                      axis=0, mode="clip")
    occ = occ_seg > 0.0                             # [R, n_seg] bool
    occ_all = occ_all_orig = occ
    if cfg.occ_trans_eps > 0.0:
        # transmittance-aware eligibility: drop segments behind an
        # estimated-opaque surface, T_est = exp(-cumsum_excl(tau)) from
        # the MEAN-sigma channel (expected optical depth; the max
        # channel would treat any cell containing a thin surface as
        # fully opaque). Each segment's contribution is additionally
        # capped (occ_elig_tau_cap) so a single cell — even one pinned
        # at the sigma ceiling during the high-LR phase — can never
        # cut a ray by itself; cutting needs ln(1/eps)/tau_cap (~3)
        # consecutive opaque segments. Spends the fixed keep-budget on
        # segments that can still contribute.
        sig = jnp.minimum(elig_seg, SIGMA_EMA_MAX)
        tau = jnp.minimum(sig * seg_len, cfg.occ_elig_tau_cap)
        cum_tau = jnp.cumsum(tau, axis=-1) - tau     # exclusive
        occ = jnp.logical_and(occ, jnp.exp(-cum_tau)
                              > cfg.occ_trans_eps)

    # exploration rays (TRAIN only): ignore the transmittance cut so
    # regions behind the estimated horizon keep receiving supervision —
    # hash-collision fog there is otherwise never corrected and the
    # horizon creeps toward the camera over long runs (see
    # ModelConfig.occ_explore_eps)
    if key is not None and cfg.occ_explore_eps > 0.0:
        key, key_explore = jax.random.split(key)
        explore = jax.random.bernoulli(
            key_explore, cfg.occ_explore_eps, (r, 1))
        occ = jnp.where(explore, occ_all, occ)

    # 2. stratified ranks among the M occupied segments: slot j picks
    # occupied-rank floor((j + u) * M / K) — evenly spaced at u=0.5
    # (VALIDATE), jittered per (ray, slot) in TRAIN so the fixed pattern
    # cannot systematically miss thin structures when M > K.
    #
    # Exploration SLOTS (TRAIN only): the last occ_explore_slots slots
    # stratify over ALL occupied segments instead of only the
    # transmittance-eligible ones. Every ray keeps (keep - n_exp) slots
    # of surface budget while collectively the batch sweeps the space
    # behind the estimated horizon, where hash-collision fog is
    # otherwise never supervised (the long-horizon density runaway,
    # BENCH_NOTES.md). Full-ray exploration (occ_explore_eps) measured
    # worse: rays that spend their whole budget spread reconstruct the
    # surface poorly and fight the distortion loss.
    n_exp = (min(cfg.occ_explore_slots, keep - 1)
             if key is not None else 0)
    k_base = keep - n_exp
    occ_i = occ.astype(jnp.int32)
    cum = jnp.cumsum(occ_i, axis=-1)                # [R, n_seg]
    m = cum[:, -1:]                                 # [R, 1]
    j = jnp.arange(keep, dtype=jnp.float32)[None, :]
    if key is None:
        u = jnp.full((r, keep), 0.5)
        key_within = None
    else:
        key_rank, key_within = jax.random.split(key)
        u = jax.random.uniform(key_rank, (r, keep))
    ranks = jnp.where(
        m > k_base,
        jnp.floor((j + u) * m.astype(jnp.float32) / k_base),
        j).astype(jnp.int32)                        # [R, keep]
    if n_exp:
        if cfg.occ_explore_targeted:
            # stratify explore slots over the occupied-but-INELIGIBLE
            # segments — exactly the set that receives no supervision
            # from the base slots. Under heavy occupancy, stratifying
            # over ALL occupied segments (below) spends most explore
            # samples in front of the horizon where the base slots
            # already are; targeting the ineligible set concentrates
            # the whole explore budget on the collision-fog region
            # (the long-horizon runaway's fuel, BENCH_NOTES.md). Falls
            # back to all-occupied when every segment is eligible.
            occ_tgt = jnp.logical_and(occ_all, jnp.logical_not(occ))
            has_tgt = jnp.any(occ_tgt, axis=-1, keepdims=True)
            occ_all = jnp.where(has_tgt, occ_tgt, occ_all)
        cum_all = jnp.cumsum(occ_all.astype(jnp.int32), axis=-1)
        m_all = cum_all[:, -1:]
        jj = j - k_base                              # index among explore
        ranks_exp = jnp.floor(
            (jj + u) * m_all.astype(jnp.float32) / n_exp).astype(
            jnp.int32)
        is_exp = jnp.arange(keep)[None, :] >= k_base  # [1, keep]
        ranks = jnp.where(is_exp, ranks_exp, ranks)
        m_sel = jnp.where(is_exp, m_all, m)          # [R, keep]
        cum_sel = jnp.where(is_exp[:, :, None], cum_all[:, None, :],
                            cum[:, None, :])         # [R, keep, n_seg]
        occ_sel = jnp.where(is_exp[:, :, None], occ_all[:, None, :],
                            occ[:, None, :])
    else:
        m_sel = m
        cum_sel = cum[:, None, :]
        occ_sel = occ[:, None, :]
    valid_seg = ranks < m_sel                       # [R, keep]

    # 3. rank -> segment index: unique s with occ[s] & cum[s] == rank+1
    hit = (cum_sel == (ranks + 1)[:, :, None]) & occ_sel
    seg_idx = jnp.sum(
        hit * jnp.arange(n_seg, dtype=jnp.int32)[None, None, :],
        axis=-1)                                    # [R, keep]

    # 4. stratified samples inside each kept segment
    if key_within is None:
        u = jnp.full((r, keep, sps), 0.5)
    else:
        u = jax.random.uniform(key_within, (r, keep, sps))
    base = (cfg.sample_near
            + seg_idx.astype(jnp.float32)[..., None] * seg_len)
    within = (jnp.arange(sps, dtype=jnp.float32)[None, None, :] + u) \
        * (seg_len / sps)
    t = (base + within).reshape(r, keep * sps)      # [R, S]
    dt_local = jnp.where(valid_seg[..., None],
                         seg_len / sps, 0.0)
    dt = jnp.broadcast_to(dt_local, (r, keep, sps)).reshape(r, keep * sps)
    valid = jnp.broadcast_to(valid_seg[..., None],
                             (r, keep, sps)).reshape(r, keep * sps)

    pts = rays_o[:, None, :] + dirs[:, None, :] * t[..., None]

    # occupied-but-ineligible flag per kept slot (only explore slots can
    # select such segments; base slots stratify over the eligible set)
    ineg = jnp.logical_and(occ_all_orig, jnp.logical_not(occ))
    slot_ineg = jnp.logical_and(
        jnp.take_along_axis(ineg, seg_idx, axis=-1), valid_seg)
    explore = jnp.broadcast_to(
        slot_ineg[..., None], (r, keep, sps)).reshape(r, keep * sps)
    return OccSamples(pts=pts, dirs=dirs, dt=dt, t=t, valid=valid,
                      explore=explore)
