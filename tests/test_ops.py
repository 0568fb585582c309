"""Golden + gradient tests for the core ops, against numpy oracles that
replicate the reference CUDA semantics (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f2nerf_tpu.ops.composite import (composite, density_activation,
                                      exclusive_cumsum, weight_variance)
from f2nerf_tpu.ops.contraction import contract
from f2nerf_tpu.ops.sh import sh_encode
from f2nerf_tpu.ops.trunc_exp import trunc_exp


class TestTruncExp:
    def test_forward(self):
        x = jnp.array([-2.0, 0.0, 3.0, 10.0])
        np.testing.assert_allclose(trunc_exp(x), np.exp(x), rtol=1e-6)

    def test_backward_clamps(self):
        # reference CustomOps.cpp:16-19: bwd = g * exp(clamp(x, -100, 5))
        g = jax.grad(lambda x: trunc_exp(x))(10.0)
        np.testing.assert_allclose(g, np.exp(5.0), rtol=1e-6)
        g = jax.grad(lambda x: trunc_exp(x))(2.0)
        np.testing.assert_allclose(g, np.exp(2.0), rtol=1e-6)


class TestContraction:
    def test_identity_inside(self, rng):
        p = rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
        np.testing.assert_allclose(contract(jnp.asarray(p)), p, atol=1e-7)

    def test_outside_formula(self, rng):
        # reference hash_3d_anchored.cpp:79-82
        p = rng.normal(0, 3.0, (128, 3)).astype(np.float32)
        norm = np.linalg.norm(p, axis=-1, keepdims=True)
        p = p[norm[:, 0] > 1.0]
        norm = np.linalg.norm(p, axis=-1, keepdims=True)
        expect = (1.0 + 1.0 - 1.0 / norm) * p / norm
        np.testing.assert_allclose(contract(jnp.asarray(p)), expect,
                                   rtol=1e-5)

    def test_maps_into_ball_of_2(self, rng):
        p = rng.normal(0, 50.0, (256, 3)).astype(np.float32)
        out = np.asarray(contract(jnp.asarray(p)))
        assert np.linalg.norm(out, axis=-1).max() < 2.0 + 1e-5

    def test_continuous_at_boundary(self):
        eps = 1e-4
        a = contract(jnp.array([[1.0 - eps, 0.0, 0.0]]))
        b = contract(jnp.array([[1.0 + eps, 0.0, 0.0]]))
        assert float(jnp.abs(a - b).max()) < 1e-3

    def test_gradient(self, rng):
        p = jnp.asarray(rng.normal(0, 1.5, (8, 3)).astype(np.float32))
        jax.test_util.check_grads(
            lambda x: jnp.sum(jnp.sin(contract(x))), (p,), order=1,
            modes=["rev"], atol=1e-2, rtol=1e-2)


# SH coefficients: same polynomial table as reference sh_shader.cu
def _sh_oracle_deg4(d):
    x, y, z = d
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    return np.array([
        0.28209479177387814,
        -0.48860251190291987 * y, 0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy, -1.0925484305920792 * yz,
        0.94617469575755997 * z2 - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (x2 - y2),
        0.59004358992664352 * y * (-3.0 * x2 + y2),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z2),
        0.3731763325901154 * z * (5.0 * z2 - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z2),
        1.4453057213202769 * z * (x2 - y2),
        0.59004358992664352 * x * (-x2 + 3.0 * y2),
    ])


class TestSH:
    def test_degree4_matches_oracle(self, rng):
        d = rng.normal(size=(32, 3))
        d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(
            np.float32)
        out = np.asarray(sh_encode(jnp.asarray(d), 4))
        expect = np.stack([_sh_oracle_deg4(di) for di in d])
        np.testing.assert_allclose(out, expect, atol=1e-5)

    @pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_shapes(self, degree):
        d = jnp.ones((4, 3)) / np.sqrt(3.0)
        assert sh_encode(d, degree).shape == (4, degree * degree)

    def test_differentiable_wrt_dirs(self, rng):
        # the reference CUDA SH has no backward (SURVEY.md N3); ours must
        d = rng.normal(size=(4, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
        jax.test_util.check_grads(
            lambda x: jnp.sum(sh_encode(x, 4) ** 2), (d,), order=1,
            modes=["rev"], atol=1e-2, rtol=1e-2)


def _reference_composite_oracle(sec_density, colors, t, bg, trans_eps):
    """Numpy replica of the reference two-pass renderer
    (src/renderer.cpp:58-122): pass-1 transmittance mask + compaction,
    pass-2 compositing over survivors."""
    r, s = sec_density.shape
    rgb = np.zeros((r, 3))
    depth = np.zeros(r)
    weights = np.zeros((r, s))
    for i in range(r):
        acc = np.concatenate([[0.0], np.cumsum(sec_density[i])[:-1]])
        trans_all = np.exp(-acc)
        keep = np.where(trans_all > trans_eps)[0]   # prefix by montonicity
        sd = sec_density[i][keep]
        acc2 = np.concatenate([[0.0], np.cumsum(sd)[:-1]])
        trans = np.exp(-acc2)
        alpha = 1.0 - np.exp(-sd)
        w = trans * alpha
        last_trans = np.exp(-np.sum(sd))
        rgb[i] = (w[:, None] * colors[i][keep]).sum(0) + last_trans * bg[i]
        depth[i] = (w * (t[i][keep] + 1e-2)).sum() / (1 - last_trans + 1e-4)
        weights[i][keep] = w
    return rgb, depth, weights


class TestComposite:
    def test_matches_reference_two_pass(self, rng):
        r, s = 8, 64
        sigma = rng.uniform(0, 4.0, (r, s)).astype(np.float32)
        dt = np.full((r, s), 1.0 / 16, dtype=np.float32)
        dt[:, 0] = 0.0
        sec = sigma * dt
        colors = rng.uniform(0, 1, (r, s, 3)).astype(np.float32)
        t = np.cumsum(np.full((r, s), 1.0 / 16), axis=1).astype(np.float32)
        bg = rng.uniform(0, 1, (r, 3)).astype(np.float32)

        rgb, depth, w, mask = composite(
            jnp.asarray(sec), jnp.asarray(colors), jnp.asarray(t),
            jnp.asarray(bg), 1e-4)
        e_rgb, e_depth, e_w = _reference_composite_oracle(
            sec, colors, t, bg, 1e-4)
        np.testing.assert_allclose(rgb, e_rgb, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(depth, e_depth, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(w, e_w, rtol=2e-4, atol=1e-6)

    def test_empty_ray_is_background(self):
        sec = jnp.zeros((2, 16))
        colors = jnp.ones((2, 16, 3)) * 0.7
        t = jnp.ones((2, 16))
        bg = jnp.asarray([[0.1, 0.2, 0.3], [0.9, 0.8, 0.7]])
        rgb, depth, w, _ = composite(sec, colors, t, bg)
        np.testing.assert_allclose(rgb, bg, atol=1e-6)
        np.testing.assert_allclose(w, 0.0, atol=1e-7)

    def test_exclusive_cumsum(self):
        x = jnp.asarray([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(exclusive_cumsum(x),
                                   [[0.0, 1.0, 3.0]])

    def test_density_activation(self):
        x = jnp.asarray([0.0, 3.0])
        np.testing.assert_allclose(density_activation(x, 3.0),
                                   [np.exp(-3.0), 1.0], rtol=1e-6)

    def test_gradients(self, rng):
        sec = jnp.asarray(rng.uniform(0, 1, (2, 8)).astype(np.float32))
        colors = jnp.asarray(
            rng.uniform(0, 1, (2, 8, 3)).astype(np.float32))
        t = jnp.asarray(np.cumsum(np.ones((2, 8)), 1).astype(np.float32))
        bg = jnp.full((2, 3), 0.5)

        def f(sec, colors):
            rgb, depth, w, _ = composite(sec, colors, t, bg)
            return jnp.sum(rgb) + jnp.sum(depth)

        jax.test_util.check_grads(f, (sec, colors), order=1,
                                  modes=["rev"], atol=5e-2, rtol=5e-2)


def _weight_var_oracle(weights, mask, scale=16.0):
    """Reference WeightVarLossForwardKernel (CustomOps.cu:13-36)."""
    out = np.zeros(weights.shape[0])
    for i in range(weights.shape[0]):
        w = weights[i][mask[i]]
        if w.size == 0:
            continue
        pos = np.arange(w.size) / scale
        wsum = w.sum() + 1e-6
        mean = (w * pos).sum() / wsum
        out[i] = (w * (pos - mean) ** 2).sum()
    return out


class TestWeightVariance:
    def test_matches_oracle(self, rng):
        w = rng.uniform(0, 0.2, (8, 32)).astype(np.float32)
        # prefix masks, like the renderer produces
        lens = rng.integers(1, 32, 8)
        mask = np.arange(32)[None, :] < lens[:, None]
        w = w * mask
        out = weight_variance(jnp.asarray(w), jnp.asarray(mask))
        np.testing.assert_allclose(out, _weight_var_oracle(w, mask),
                                   rtol=1e-4, atol=1e-6)

    def test_gradient(self, rng):
        w = jnp.asarray(rng.uniform(0.01, 0.2, (2, 8)).astype(np.float32))
        mask = jnp.ones((2, 8), bool)
        jax.test_util.check_grads(
            lambda w: jnp.sum(weight_variance(w, mask)), (w,), order=1,
            modes=["rev"], atol=5e-2, rtol=5e-2)


def _distortion_oracle(w, t, dt, mask, march):
    """O(S^2) pairwise mip-NeRF-360 distortion."""
    w = w * mask
    s = (t - 0.5 * dt) / march
    d = dt / march
    out = np.zeros(w.shape[0], np.float32)
    for i in range(w.shape[0]):
        diff = np.abs(s[i][:, None] - s[i][None, :])
        out[i] = (w[i][:, None] * w[i][None, :] * diff).sum() \
            + (w[i] ** 2 * d[i]).sum() / 3.0
    return out


class TestDistortionLoss:
    def _rand_samples(self, rng, r=8, s=32):
        # monotone t with random intervals; prefix masks like the
        # renderer produces; weights zero outside the mask
        dt = rng.uniform(0.01, 0.1, (r, s)).astype(np.float32)
        t = np.cumsum(dt, axis=1).astype(np.float32)
        lens = rng.integers(1, s, r)
        mask = np.arange(s)[None, :] < lens[:, None]
        w = (rng.uniform(0, 0.2, (r, s)) * mask).astype(np.float32)
        dt = dt * mask
        return w, t, dt, mask

    def test_matches_pairwise_oracle(self, rng):
        from f2nerf_tpu.ops.composite import distortion_loss
        w, t, dt, mask = self._rand_samples(rng)
        march = 4.0
        out = distortion_loss(jnp.asarray(w), jnp.asarray(t),
                              jnp.asarray(dt), jnp.asarray(mask), march)
        np.testing.assert_allclose(
            out, _distortion_oracle(w, t, dt, mask, march),
            rtol=1e-4, atol=1e-6)

    def test_concentrated_beats_spread(self, rng):
        # one spike vs the same total weight spread over the ray: the
        # normalized loss must prefer the spike regardless of its depth
        # (the property the reference's unnormalized variance lacks)
        from f2nerf_tpu.ops.composite import distortion_loss
        s = 64
        dt = np.full((2, s), 1.0 / 16.0, np.float32)
        t = np.cumsum(dt, axis=1).astype(np.float32)
        mask = np.ones((2, s), bool)
        w = np.zeros((2, s), np.float32)
        w[0, s - 2] = 0.9                    # far spike
        w[1, :] = 0.9 / s                    # spread
        out = np.asarray(distortion_loss(
            jnp.asarray(w), jnp.asarray(t), jnp.asarray(dt),
            jnp.asarray(mask), float(s / 16.0)))
        assert out[0] < 0.1 * out[1]

    def test_gradient(self, rng):
        from f2nerf_tpu.ops.composite import distortion_loss
        w, t, dt, mask = self._rand_samples(rng, r=2, s=8)
        jax.test_util.check_grads(
            lambda w_: jnp.sum(distortion_loss(
                w_, jnp.asarray(t), jnp.asarray(dt), jnp.asarray(mask),
                4.0)), (jnp.asarray(w),), order=1, modes=["rev"],
            atol=5e-2, rtol=5e-2)
