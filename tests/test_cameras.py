"""Camera/ray math tests (reference src/rays.cpp, src/localizer.cpp)."""

import jax.numpy as jnp
import numpy as np

from f2nerf_tpu.core.cameras import (camera2world, normalize_poses,
                                     pixel_grid, rays_from_pose,
                                     world2camera)


def _rays_oracle(pose, intrinsic, ij):
    """Reference get_rays_from_pose (src/rays.cpp:7-29)."""
    i = ij[:, 0] + 0.5
    j = ij[:, 1] + 0.5
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    u = (j - cx) / fx
    v = -((i - cy) / fy)
    w = -np.ones_like(u)
    d = np.stack([u, v, w], -1) @ pose[:3, :3].T
    o = np.tile(pose[:3, 3], (len(ij), 1))
    return o, d


class TestRays:
    def test_matches_oracle(self, rng):
        pose = np.eye(3, 4, dtype=np.float32)
        pose[:3, 3] = [0.1, -0.2, 0.5]
        th = 0.4
        pose[:3, :3] = [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]]
        intr = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]],
                        dtype=np.float32)
        ij = rng.integers(0, 24, (16, 2)).astype(np.float32)
        o, d = rays_from_pose(jnp.asarray(pose)[None],
                              jnp.asarray(intr)[None], jnp.asarray(ij))
        eo, ed = _rays_oracle(pose, intr, ij)
        np.testing.assert_allclose(np.asarray(o), eo, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d), ed, atol=1e-5)

    def test_batched_poses(self, rng):
        poses = np.tile(np.eye(3, 4, dtype=np.float32), (5, 1, 1))
        poses[:, :3, 3] = rng.normal(size=(5, 3))
        intr = np.tile(np.array([[50.0, 0, 16], [0, 50.0, 12],
                                 [0, 0, 1]], dtype=np.float32),
                       (5, 1, 1))
        ij = rng.integers(0, 24, (5, 2)).astype(np.float32)
        o, d = rays_from_pose(jnp.asarray(poses), jnp.asarray(intr),
                              jnp.asarray(ij))
        assert o.shape == (5, 3) and d.shape == (5, 3)
        for k in range(5):
            eo, ed = _rays_oracle(poses[k], intr[k], ij[k:k + 1])
            np.testing.assert_allclose(np.asarray(o[k]), eo[0], atol=1e-6)
            np.testing.assert_allclose(np.asarray(d[k]), ed[0], atol=1e-5)

    def test_pixel_grid_row_major(self):
        g = pixel_grid(2, 3)
        np.testing.assert_array_equal(
            g, [[0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [1, 2]])


class TestFrames:
    def test_world_camera_roundtrip(self, rng):
        center = jnp.asarray([1.0, 2.0, 3.0])
        radius = 5.0
        pose_w = np.eye(4, dtype=np.float32)
        pose_w[:3, 3] = [4.0, -1.0, 2.0]
        cam = world2camera(jnp.asarray(pose_w), center, radius)
        assert cam.shape == (3, 4)
        back = camera2world(cam, center, radius)
        np.testing.assert_allclose(np.asarray(back), pose_w, atol=1e-5)

    def test_normalize_poses(self, rng):
        poses = np.tile(np.eye(3, 4, dtype=np.float32), (10, 1, 1))
        poses[:, :3, 3] = rng.normal(2.0, 3.0, (10, 3))
        out, center, radius = normalize_poses(poses)
        np.testing.assert_allclose(center, poses[:, :3, 3].mean(0),
                                   atol=1e-6)
        r = np.linalg.norm(out[:, :3, 3], axis=-1)
        assert abs(r.max() - 1.0) < 1e-5
