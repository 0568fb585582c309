"""Camera / ray math.

Reference semantics: ``src/rays.cpp:7-29`` (pinhole back-projection with a
half-pixel shift, OpenGL-style camera: x right, y up, z back) and the
world<->NeRF axis conversion used by the localizer
(``src/localizer.cpp:44-61,318-346``) and the dataset tooling
(``scripts/convert_pose_tsv_to_f2_format.py:25-30``).

All functions are pure jnp and differentiable — in particular
``rays_from_pose`` is the differentiable link that lets pose gradients flow
through the renderer for localization (reference ``src/localizer.cpp:142-167``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rays_from_pose(pose: jnp.ndarray, intrinsic: jnp.ndarray,
                   ij: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate rays for pixel coordinates.

    Args:
      pose: [..., 3, 4] camera-to-world (rotation | translation), OpenGL
        convention (camera looks down -z).
      intrinsic: [..., 3, 3] pinhole K.
      ij: [..., 2] pixel (row i, col j) coordinates; the half-pixel center
        shift is applied here (reference src/rays.cpp:10-11).

    Returns:
      (origins [..., 3], dirs [..., 3]); dirs are NOT normalized (the
      sampler normalizes, matching reference points_sampler.cpp:24).
    """
    i = ij[..., 0].astype(jnp.float32) + 0.5
    j = ij[..., 1].astype(jnp.float32) + 0.5

    fx = intrinsic[..., 0, 0]
    fy = intrinsic[..., 1, 1]
    cx = intrinsic[..., 0, 2]
    cy = intrinsic[..., 1, 2]

    u = (j - cx) / fx
    v = -((i - cy) / fy)
    w = -jnp.ones_like(u)
    dir_cam = jnp.stack([u, v, w], axis=-1)                     # [..., 3]

    rot = pose[..., :3, :3]
    trans = pose[..., :3, 3]
    rays_d = jnp.einsum("...ij,...j->...i", rot, dir_cam)
    rays_o = jnp.broadcast_to(trans, rays_d.shape)
    return rays_o, rays_d


def pixel_grid(h: int, w: int) -> np.ndarray:
    """All-pixel (i, j) grid, row-major — reference renderer.cpp:157-161."""
    ii, jj = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    return np.stack([ii.reshape(-1), jj.reshape(-1)], axis=-1)


# World coordinates (x front, y left, z up) <-> NeRF camera coords
# (x right, y up, z back). Reference src/localizer.cpp:50-61.
AXIS_CONVERT_MAT = np.array(
    [[0.0, 0.0, -1.0, 0.0],
     [-1.0, 0.0, 0.0, 0.0],
     [0.0, 1.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]], dtype=np.float32)


def world2camera(pose_in_world: jnp.ndarray, center: jnp.ndarray,
                 radius: float) -> jnp.ndarray:
    """4x4 world pose -> normalized 3x4 NeRF pose (src/localizer.cpp:318-331)."""
    a = jnp.asarray(AXIS_CONVERT_MAT)
    x = a.T @ (pose_in_world @ a)
    t = (x[:3, 3] - center) / radius
    x = x.at[:3, 3].set(t)
    return x[:3, :4]


def camera2world(pose_in_camera: jnp.ndarray, center: jnp.ndarray,
                 radius: float) -> jnp.ndarray:
    """3x4 NeRF pose -> 4x4 world pose (src/localizer.cpp:333-346)."""
    a = jnp.asarray(AXIS_CONVERT_MAT)
    x = jnp.concatenate(
        [pose_in_camera, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
    t = x[:3, 3] * radius + center
    x = x.at[:3, 3].set(t)
    return a @ (x @ a.T)


def normalize_poses(poses: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
    """Center the camera cloud and scale to unit max radius.

    Reference src/dataset.cpp:77-86. Returns (poses, center, radius).
    """
    poses = poses.copy()
    cam_pos = poses[:, :3, 3]
    center = cam_pos.mean(axis=0)
    bias = cam_pos - center
    radius = float(np.linalg.norm(bias, axis=-1).max())
    poses[:, :3, 3] = bias / radius
    return poses, center, radius
