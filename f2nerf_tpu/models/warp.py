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

Like the original's per-octree-leaf warps, F is continuous inside a
region but not across region boundaries; the hash field absorbs the
seams during training.
"""

from __future__ import annotations

from typing import NamedTuple

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

        # probe points around the anchor (region scale ~ 2x spacing)
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


def warp_points(points: jnp.ndarray, tables: WarpTables) -> jnp.ndarray:
    """[P, 3] world points -> [P, 3] warped coords in ~[-2, 2]^3."""
    n = tables.n_cams
    # nearest anchor (M is small; plain argmin, no gather needed)
    d2 = jnp.sum(
        (points[:, None, :] - tables.anchors[None, :, :]) ** 2, axis=-1)
    region = jnp.argmin(d2, axis=-1)                      # [P]
    row = jnp.take(tables.rows, region, axis=0, mode="clip")  # [P, 128]

    w2c = row[:, :12 * n].reshape(-1, n, 3, 4)
    mean = row[:, 12 * n:14 * n]
    pca = row[:, 14 * n:20 * n].reshape(-1, 3, 2 * n)
    scale = row[:, 20 * n:20 * n + 3]

    c = (jnp.einsum("pnij,pj->pni", w2c[..., :3], points)
         + w2c[..., 3])                                   # [P, n, 3]
    z = jnp.maximum(-c[..., 2], 1e-2)
    uv = jnp.stack([c[..., 0] / z, c[..., 1] / z],
                   axis=-1).reshape(points.shape[0], 2 * n)
    y = jnp.einsum("pij,pj->pi", pca, uv - mean) * scale  # [P, 3]
    return jnp.clip(y, -1.999, 1.999)
