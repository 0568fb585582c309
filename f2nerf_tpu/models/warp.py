"""Perspective warp: image-space-adaptive input warping.

The original F2-NeRF (CVPR 2023) — whose method the BASELINE north star
names — warps space before hashing so grid resolution tracks
image-space sampling rates along free camera trajectories: each spatial
region gets F(x) = PCA_3 of the concatenated perspective projections of
x onto the region's visible cameras. The mounted fork stripped this
machinery (SURVEY.md overview) and kept only a radial contraction.

This is a TPU-native, static-shape rebuild of the idea:

* M anchor regions = a stride-subsample of the training cameras; a
  point belongs to its nearest anchor (one small [P, M] argmin — no
  tree, no data-dependent control flow).
* Each region has n fixed cameras (the anchors nearest it). The warp is
  F_k(x) = S_k · PCA_k · (proj_k(x) - mu_k), where proj_k(x) stacks the
  n perspective projections (u, v) = (c_x, c_y) / max(-c_z, eps) in
  each camera's frame, and PCA_k / mu_k / scale S_k are precomputed
  from probe points so the warped coordinates land in the hash domain
  [-2, 2]^3.
* All per-region constants pack into one [M, 128] table row, so the
  runtime cost is one row-gather + ~50 FLOP per (point): negligible
  next to the hash encode.
* Fully differentiable (pure jnp), so pose gradients flow through the
  warp for localization.

Region blending (round 5): with ``blend_k = 1`` a point uses its
nearest anchor's chart only — continuous inside a region but
discontinuous across boundaries, like the original's per-octree-leaf
warps, and the hash field must absorb the seams (the measured cost:
3.5 dB of corridor train fit vs contraction, VERDICT r4 weak #1).
With ``blend_k > 1`` the warp becomes a smooth partition-of-unity
blend of the k nearest charts with Shepard inverse-square weights
w_i = (1/d_i^2) / sum_j (1/d_j^2): exactly one-hot at each anchor,
50/50 at region midpoints, and continuous at the top-k boundary (the
entering and leaving chart there have equal distance, hence equal
weight). Blending requires consistent chart orientation — PCA
component signs are arbitrary per region, and two neighboring charts
with opposite signs would cancel in the blend zone (a fold worse than
the seam) — so ``build_warp`` sign-aligns every chart to its nearest
already-aligned neighbor. ~k x the (negligible) warp FLOPs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

WARP_ROW = 128  # lane-padded packed region row


class WarpTables(NamedTuple):
    anchors: jnp.ndarray  # [M, 3] region anchor positions
    rows: jnp.ndarray     # [M, 128] packed (w2c | mean | pca | scale)
    n_cams: int


def _pack_rows(w2c: np.ndarray, mean: np.ndarray, pca: np.ndarray,
               scale: np.ndarray) -> np.ndarray:
    """w2c [M, n, 3, 4], mean [M, 2n], pca [M, 3, 2n], scale [M, 3]
    -> [M, 128] rows."""
    m, n = w2c.shape[0], w2c.shape[1]
    flat = np.concatenate([
        w2c.reshape(m, n * 12), mean, pca.reshape(m, 6 * n),
        scale], axis=1)
    assert flat.shape[1] <= WARP_ROW, flat.shape
    out = np.zeros((m, WARP_ROW), np.float32)
    out[:, :flat.shape[1]] = flat
    return out


def build_warp(poses: np.ndarray, cfg) -> WarpTables:
    """Precompute the warp tables from (normalized) camera poses.

    Args:
      poses: [N, 3, 4] camera-to-world (scene-normalized).
      cfg: ModelConfig (warp_n_regions, warp_n_cams).
    """
    n_images = poses.shape[0]
    m = min(cfg.warp_n_regions, n_images)
    n = min(cfg.warp_n_cams, n_images)
    sel = np.linspace(0, n_images - 1, m).round().astype(int)
    anchors = poses[sel, :3, 3]                          # [M, 3]
    cam_pos = poses[:, :3, 3]

    rng = np.random.default_rng(cfg.init_seed + 13)
    w2c_all = np.zeros((m, n, 3, 4), np.float32)
    means = np.zeros((m, 2 * n), np.float32)
    pcas = np.zeros((m, 3, 2 * n), np.float32)
    scales = np.zeros((m, 3), np.float32)

    for k in range(m):
        d = np.linalg.norm(cam_pos - anchors[k], axis=-1)
        cams = np.argsort(d)[:n]
        # typical camera spacing sets the probe region extent
        spacing = max(float(np.median(d[cams][1:])) if n > 1 else 0.5,
                      0.25)
        for i, ci in enumerate(cams):
            r = poses[ci, :3, :3]
            t = poses[ci, :3, 3]
            w2c_all[k, i, :, :3] = r.T
            w2c_all[k, i, :, 3] = -r.T @ t

        # probe points around the anchor (region scale ~ 2x spacing).
        # NOTE (round-5 measured negative, BENCH_NOTES "warp
        # recalibration"): replacing this Gaussian cloud with ray-cast
        # probes + p90 domain-filling scales + tanh squash fixed the
        # chart conditioning on paper (content filled the hash domain,
        # no clipping) and cost 5 dB of corridor train PSNR — at fixed
        # table capacity, 24 regions x full-domain content multiplies
        # the hash collision load ~24x. The "wasteful" small-core
        # mapping below is an implicit, measured-better resolution/
        # collision trade.
        probes = anchors[k] + rng.normal(
            0.0, spacing, (256, 3)).astype(np.float32)
        v = _project_np(probes, w2c_all[k])              # [256, 2n]
        mu = v.mean(axis=0)
        vc = v - mu
        # top-3 principal directions
        _, s, vt = np.linalg.svd(vc, full_matrices=False)
        pca = vt[:3]                                      # [3, 2n]
        y = vc @ pca.T                                    # [256, 3]
        std = np.maximum(y.std(axis=0), 1e-4)
        means[k] = mu
        pcas[k] = pca
        # map ~2.5 sigma to the edge of the hash domain [-2, 2]
        scales[k] = 2.0 / (2.5 * std)

    # sign-align charts for blending (see module docstring): each
    # region's PCA component signs follow its nearest already-aligned
    # region, so neighboring charts agree in orientation and the
    # Shepard blend interpolates instead of cancelling. Regions are
    # processed in anchor order (a stride-subsample of the trajectory,
    # so index neighbors are usually space neighbors; the greedy
    # nearest-aligned rule also closes ring wraparounds).
    for k in range(1, m):
        d_prev = np.linalg.norm(anchors[:k] - anchors[k], axis=-1)
        j = int(np.argmin(d_prev))
        for c in range(3):
            if np.dot(pcas[k, c], pcas[j, c]) < 0:
                pcas[k, c] = -pcas[k, c]

    return WarpTables(
        anchors=jnp.asarray(anchors.astype(np.float32)),
        rows=jnp.asarray(_pack_rows(w2c_all, means, pcas, scales)),
        n_cams=n)


def _project_np(x: np.ndarray, w2c: np.ndarray) -> np.ndarray:
    """x [P, 3], w2c [n, 3, 4] -> stacked (u, v) [P, 2n] (numpy)."""
    outs = []
    for i in range(w2c.shape[0]):
        c = x @ w2c[i, :, :3].T + w2c[i, :, 3]
        z = np.maximum(-c[:, 2], 1e-2)
        outs.append(np.stack([c[:, 0] / z, c[:, 1] / z], -1))
    return np.concatenate(outs, axis=1)


def _chart_apply(row: jnp.ndarray, points: jnp.ndarray,
                 n: int) -> jnp.ndarray:
    """Apply one packed chart row per point: row [..., 128],
    points [..., 3] -> warped [..., 3] (unclipped)."""
    w2c = row[..., :12 * n].reshape(*row.shape[:-1], n, 3, 4)
    mean = row[..., 12 * n:14 * n]
    pca = row[..., 14 * n:20 * n].reshape(*row.shape[:-1], 3, 2 * n)
    scale = row[..., 20 * n:20 * n + 3]
    c = (jnp.einsum("...nij,...j->...ni", w2c[..., :3], points)
         + w2c[..., 3])                                   # [..., n, 3]
    z = jnp.maximum(-c[..., 2], 1e-2)
    uv = jnp.concatenate([(c[..., 0] / z)[..., None],
                          (c[..., 1] / z)[..., None]],
                         axis=-1).reshape(*row.shape[:-1], 2 * n)
    return jnp.einsum("...ij,...j->...i", pca, uv - mean) * scale


def warp_points(points: jnp.ndarray, tables: WarpTables,
                blend_k: int = 1) -> jnp.ndarray:
    """[P, 3] world points -> [P, 3] warped coords in ~[-2, 2]^3.

    ``blend_k=1``: hard nearest-anchor chart (the original per-region
    warp; discontinuous at region boundaries). ``blend_k>1``: smooth
    partition-of-unity blend of the k nearest charts with Shepard
    inverse-square weights — see module docstring.
    """
    n = tables.n_cams
    m = tables.anchors.shape[0]
    d2 = jnp.sum(
        (points[:, None, :] - tables.anchors[None, :, :]) ** 2, axis=-1)
    k = min(max(int(blend_k), 1), m)
    if k == 1:
        # nearest anchor (M is small; plain argmin, no gather needed)
        region = jnp.argmin(d2, axis=-1)                  # [P]
        row = jnp.take(tables.rows, region, axis=0,
                       mode="clip")                       # [P, 128]
        y = _chart_apply(row, points, n)
        return jnp.clip(y, -1.999, 1.999)

    neg_d2, idx = jax.lax.top_k(-d2, k)                   # [P, K]
    rows = jnp.take(tables.rows, idx, axis=0,
                    mode="clip")                          # [P, K, 128]
    inv = 1.0 / jnp.maximum(-neg_d2, 1e-10)               # [P, K]
    w = inv / jnp.sum(inv, axis=-1, keepdims=True)
    yk = _chart_apply(rows,
                      jnp.broadcast_to(points[:, None, :],
                                       (points.shape[0], k, 3)),
                      n)                                  # [P, K, 3]
    y = jnp.sum(w[..., None] * yk, axis=1)
    return jnp.clip(y, -1.999, 1.999)
