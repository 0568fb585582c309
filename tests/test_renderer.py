"""Renderer integration tests (reference src/renderer.cpp semantics)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from f2nerf_tpu.models import occupancy, renderer


def _rand_rays(rng, n):
    o = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


class TestRender:
    def test_shapes_and_ranges(self, tiny_cfg, rng):
        cfg = tiny_cfg.model
        params, consts = renderer.init(jax.random.key(0), cfg, 4)
        o, d = _rand_rays(rng, 8)
        res = renderer.render(params, consts, o, d,
                              jnp.zeros(8, jnp.int32), cfg,
                              jax.random.key(1), train=True)
        assert res.colors.shape == (8, 3)
        assert res.depths.shape == (8,)
        assert res.weights.shape == (8, cfg.n_samples)
        assert bool(jnp.isfinite(res.colors).all())
        # weights are zero outside the keep mask
        w_out = jnp.where(res.mask, 0.0, res.weights)
        np.testing.assert_allclose(np.asarray(w_out), 0.0, atol=1e-7)

    def test_validate_deterministic(self, tiny_cfg, rng):
        cfg = tiny_cfg.model
        params, consts = renderer.init(jax.random.key(0), cfg, 4)
        o, d = _rand_rays(rng, 8)
        r1 = renderer.render(params, consts, o, d, None, cfg, None,
                             train=False)
        r2 = renderer.render(params, consts, o, d, None, cfg, None,
                             train=False)
        np.testing.assert_array_equal(np.asarray(r1.colors),
                                      np.asarray(r2.colors))

    def test_occ_mode(self, occ_cfg, rng):
        cfg = occ_cfg.model
        params, consts = renderer.init(jax.random.key(0), cfg, 4)
        bits = occupancy.occupancy_bits(occupancy.init_grid(cfg), cfg)
        o, d = _rand_rays(rng, 8)
        res = renderer.render(params, consts, o, d,
                              jnp.zeros(8, jnp.int32), cfg,
                              jax.random.key(1), train=True,
                              occ_bits=bits)
        s = cfg.occ_keep * cfg.occ_samples_per_segment
        assert res.weights.shape == (8, s)
        assert bool(jnp.isfinite(res.colors).all())

    def test_render_image_chunking(self, tiny_cfg):
        cfg = tiny_cfg.model
        params, consts = renderer.init(jax.random.key(0), cfg, 4)
        pose = jnp.eye(3, 4)
        intr = jnp.asarray([[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1.0]])
        rgb, depth = renderer.render_image(params, consts, pose, intr,
                                           12, 16, cfg, chunk=64)
        assert rgb.shape == (12, 16, 3)
        assert depth.shape == (12, 16)
        assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0
        # chunk size must not change the result
        rgb2, _ = renderer.render_image(params, consts, pose, intr,
                                        12, 16, cfg, chunk=192)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb2),
                                   atol=1e-6)

    def test_app_embedding_only_in_train(self, tiny_cfg, rng):
        cfg = tiny_cfg.model
        params, consts = renderer.init(jax.random.key(0), cfg, 4)
        # make app_emb large so its effect is visible
        params = dict(params)
        params["app_emb"] = jnp.ones_like(params["app_emb"]) * 3.0
        o, d = _rand_rays(rng, 4)
        emb0 = jnp.zeros(4, jnp.int32)
        r_train = renderer.render(params, consts, o, d, emb0, cfg,
                                  jax.random.key(1), train=True)
        r_val = renderer.render(params, consts, o, d, emb0, cfg, None,
                                train=False)
        # train uses app_emb (and jitter); results must differ
        assert not np.allclose(np.asarray(r_train.colors),
                               np.asarray(r_val.colors), atol=1e-4)

    def test_eval_emb(self, tiny_cfg, rng):
        """VALIDATE-mode appearance vector (renderer.py eval_emb):
        zeros is a no-op, the mean trained embedding shifts the shading
        exactly like the TRAIN-path embedding add, and the chunked
        renderer threads it through."""
        cfg = tiny_cfg.model
        params, consts = renderer.init(jax.random.key(0), cfg, 4)
        params = dict(params)
        params["app_emb"] = jnp.asarray(
            rng.normal(0, 2.0, params["app_emb"].shape), jnp.float32)
        o, d = _rand_rays(rng, 4)
        base = renderer.render(params, consts, o, d, None, cfg, None,
                               train=False)
        zero = renderer.render(params, consts, o, d, None, cfg, None,
                               train=False,
                               eval_emb=jnp.zeros(cfg.app_emb_dim))
        np.testing.assert_allclose(np.asarray(base.colors),
                                   np.asarray(zero.colors), atol=1e-6)
        mean_emb = jnp.mean(params["app_emb"], axis=0)
        shifted = renderer.render(params, consts, o, d, None, cfg, None,
                                  train=False, eval_emb=mean_emb)
        assert not np.allclose(np.asarray(base.colors),
                               np.asarray(shifted.colors), atol=1e-4)
        # identical to the TRAIN embedding path with jitter off: an
        # index whose row equals the mean, rendered via TRAIN=false is
        # not reachable, so compare against chunked VALIDATE instead
        c_chunk, _ = renderer.render_rays_chunked(
            params, consts, o, d, cfg, chunk=2, eval_emb=mean_emb)
        np.testing.assert_allclose(np.asarray(shifted.colors),
                                   np.asarray(c_chunk), atol=1e-6)

    def test_supersample_render(self, tiny_cfg):
        """supersample=2 averages a 2x2 exact subpixel grid; output
        shape is unchanged and the image stays in range. The k=1 path
        must be bit-identical to the default."""
        cfg = tiny_cfg.model
        params, consts = renderer.init(jax.random.key(0), cfg, 4)
        pose = jnp.eye(3, 4)
        intr = jnp.asarray([[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1.0]])
        rgb1, dep1 = renderer.render_image(params, consts, pose, intr,
                                           8, 10, cfg, chunk=64)
        rgb1b, _ = renderer.render_image(params, consts, pose, intr,
                                         8, 10, cfg, chunk=64,
                                         supersample=1)
        np.testing.assert_array_equal(np.asarray(rgb1),
                                      np.asarray(rgb1b))
        rgb2, dep2 = renderer.render_image(params, consts, pose, intr,
                                           8, 10, cfg, chunk=64,
                                           supersample=2)
        assert rgb2.shape == (8, 10, 3) and dep2.shape == (8, 10)
        assert float(rgb2.min()) >= 0.0 and float(rgb2.max()) <= 1.0
        # supersampled render approximates the center-ray render
        assert float(jnp.abs(rgb2 - rgb1).mean()) < 0.2

    @pytest.mark.slow
    def test_pose_gradient_flows(self, tiny_cfg):
        """Differentiable pose path (the localizer's core requirement;
        broken in the reference via the SH kernel, SURVEY.md §3.4)."""
        cfg = tiny_cfg.model
        params, consts = renderer.init(jax.random.key(0), cfg, 4)
        from f2nerf_tpu.core.cameras import rays_from_pose
        intr = jnp.asarray([[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1.0]])
        ij = jnp.asarray(np.array([[4.0, 5.0], [8.0, 3.0]]))

        def f(pose):
            o, d = rays_from_pose(pose[None], intr[None], ij)
            res = renderer.render(params, consts, o, d, None, cfg, None,
                                  train=False)
            return jnp.sum(res.colors)

        g = jax.grad(f)(jnp.eye(3, 4))
        assert g.shape == (3, 4)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0.0


def test_infinite_density_does_not_nan(tiny_cfg, rng):
    """TruncExp density can overflow to inf at extreme params; samples
    with dt == 0 (the dt_0 = 0 convention / invalid occ slots) must not
    turn inf * 0 into NaN in the compositing chain."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from f2nerf_tpu.models import renderer as rnd
    cfg = tiny_cfg.model
    key = jax.random.key(0)
    params, consts = rnd.init(key, cfg, n_images=2)
    # blow up the density head so sigma = exp(raw) overflows
    params["field"]["mlp"]["w"] = params["field"]["mlp"]["w"] * 0.0
    params["field"]["mlp"]["b"] = params["field"]["mlp"]["b"].at[0].set(
        1e4)
    o = jnp.zeros((4, 3))
    d = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    res = rnd.render(params, consts, o, d, None, cfg, None, train=False)
    assert bool(jnp.isfinite(res.colors).all())
    assert bool(jnp.isfinite(res.depths).all())


@pytest.mark.slow
class TestDenseTwoPass:
    """The dense TRAIN two-pass (reference renderer.cpp:58-88 early
    stop, static-shape rebuild) must reproduce the masked single pass
    exactly — outputs and gradients — in every bucket branch."""

    def _compare(self, cfg_model, rng, surv_dedup=False):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from f2nerf_tpu.models import renderer

        cfg_tp = dataclasses.replace(cfg_model, dense_two_pass=True,
                                     dense_two_pass_dedup=surv_dedup)
        cfg_sp = dataclasses.replace(cfg_model, dense_two_pass=False)
        params, consts = renderer.init(jax.random.key(0), cfg_model, 4)
        o = jnp.asarray(rng.standard_normal((8, 3)) * 0.2, jnp.float32)
        d = rng.standard_normal((8, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                        jnp.float32)
        emb = jnp.zeros((8,), jnp.int32)
        key = jax.random.key(3)

        def run(cfg, p):
            res = renderer.render(p, consts, o, d, emb, cfg, key,
                                  train=True, point_grads=False)
            return res

        def loss(cfg, p):
            res = run(cfg, p)
            return (jnp.sum(res.colors) + jnp.sum(res.depths)
                    + jnp.sum(res.weights * res.t))

        r_tp = jax.jit(lambda p: run(cfg_tp, p))(params)
        r_sp = jax.jit(lambda p: run(cfg_sp, p))(params)
        np.testing.assert_allclose(r_tp.colors, r_sp.colors,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(r_tp.depths, r_sp.depths,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(r_tp.weights, r_sp.weights,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(r_tp.mask),
                                      np.asarray(r_sp.mask))
        # sec_density contract (RenderResult docstring): the two-pass
        # zeroes the non-survivor tail, so equivalence holds under the
        # survivor mask
        m = np.asarray(r_sp.mask)
        np.testing.assert_allclose(
            np.asarray(r_tp.sec_density) * m,
            np.asarray(r_sp.sec_density) * m, rtol=1e-5, atol=1e-6)
        # and the two-pass tail is exactly zero outside the mask
        assert float(np.abs(np.asarray(r_tp.sec_density) * (~m)).max()) \
            == 0.0

        g_tp = jax.jit(jax.grad(lambda p: loss(cfg_tp, p)))(params)
        g_sp = jax.jit(jax.grad(lambda p: loss(cfg_sp, p)))(params)
        # rtol 5e-3: the switch-wrapped branch compiles as a different
        # XLA program (different fusion/reassociation) — a handful of
        # small-magnitude grad elements differ at the ~1e-3 level; a
        # real mask/slice bug would be orders of magnitude larger
        for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_sp)):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-6)
        return r_tp

    def test_full_bucket(self, tiny_cfg, rng):
        """Near-init field: nothing terminates, the full-S branch runs."""
        res = self._compare(tiny_cfg.model, rng)
        assert bool(np.asarray(res.mask).all())

    def test_prefix_bucket(self, tiny_cfg, rng):
        """Boosted density terminates rays early -> a prefix branch."""
        import dataclasses
        cfg = dataclasses.replace(tiny_cfg.model, density_shift=-2.0)
        res = self._compare(cfg, rng)
        m = np.asarray(res.mask)
        assert m.sum() < m.size  # the early-stop actually cut samples

    def test_prefix_bucket_survivor_dedup(self, tiny_cfg, rng):
        """Survivor-stream run dedup in the compact branch
        (dense_two_pass_dedup, VERDICT r4 #5): needs a dense-point-like
        sample count for budgets to exist; must stay exact vs the
        masked single pass."""
        import dataclasses

        from f2nerf_tpu.models.hash_field import compacted_budgets
        cfg = dataclasses.replace(tiny_cfg.model, n_samples=256,
                                  sample_l=1.0 / 64.0,
                                  density_shift=-2.0)
        assert compacted_budgets(cfg, cfg.n_samples) is not None
        res = self._compare(cfg, rng, surv_dedup=True)
        m = np.asarray(res.mask)
        assert m.sum() < m.size
