"""End-to-end renderer parity: our VALIDATE-mode render vs a pure-numpy
oracle that replicates the reference pipeline stage by stage
(sampler -> contraction -> XOR hash field -> density/shading split ->
SH shader -> two-pass early-stop compositing). VALIDATE mode has no
randomness, so the comparison is tight.

This is the executable form of BASELINE.md's "match the reference
renderer's output" criterion (the mounted CUDA build cannot run here;
the oracle implements the same math from the cited reference lines).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f2nerf_tpu.core.config import ModelConfig
from f2nerf_tpu.models import renderer

SH_C = None  # filled lazily from tests.test_ops oracle


def _contract_np(p):
    n = np.linalg.norm(p, axis=-1, keepdims=True)
    out = np.where(n <= 1.0, p, (1.0 + 1.0 - 1.0 / n) * p / n)
    return out


def _xor_encode_np(points, feat, primes, biases, scales):
    from tests.test_hash import _xor_oracle
    return _xor_oracle(points, feat, primes, biases, scales)


def _sh_np(dirs):
    from tests.test_ops import _sh_oracle_deg4
    return np.stack([_sh_oracle_deg4(d) for d in dirs])


def _reference_render_np(params, consts, cfg: ModelConfig, rays_o,
                         rays_d):
    """Reference Renderer::render in VALIDATE mode (renderer.cpp:33-123)
    with the uniform sampler (points_sampler.cpp:20-64)."""
    r = rays_o.shape[0]
    s = cfg.n_samples
    dirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = np.cumsum(np.ones((r, s)), axis=1) * cfg.sample_l
    pts = rays_o[:, None, :] + dirs[:, None, :] * t[..., None]
    dt = np.diff(t, axis=1, prepend=t[:, :1])
    dt[:, 0] = 0.0

    flat = _contract_np(pts.reshape(-1, 3)).astype(np.float32)
    feat_pool = np.asarray(params["field"]["feat_pool"])
    enc = _xor_encode_np(flat, feat_pool,
                         np.asarray(consts["field"]["primes"]),
                         np.asarray(consts["field"]["biases"]),
                         np.asarray(consts["field"]["scales"]))
    w = np.asarray(params["field"]["mlp"]["w"])
    b = np.asarray(params["field"]["mlp"]["b"])
    feat = enc @ w + b                                     # [R*S, F]

    sigma = np.exp(np.minimum(feat[:, 0] - cfg.density_shift, 700))
    shading = np.concatenate(
        [np.ones_like(feat[:, :1]), feat[:, 1:]], axis=1)
    sh = _sh_np(np.repeat(dirs, s, axis=0))
    x = np.concatenate([shading, sh], axis=1)
    sp = params["shader"]
    h = np.maximum(x @ np.asarray(sp["w0"]) + np.asarray(sp["b0"]), 0)
    out = h @ np.asarray(sp["w1"]) + np.asarray(sp["b1"])
    eps = 1e-3
    colors = (1 + 2 * eps) / (1 + np.exp(-out)) - eps      # [R*S, 3]

    sec = (sigma.reshape(r, s) * dt)
    from tests.test_ops import _reference_composite_oracle
    bg = np.full((r, 3), 0.5)
    rgb, depth, weights = _reference_composite_oracle(
        sec, colors.reshape(r, s, 3), t, bg, cfg.trans_eps)
    return rgb, depth, weights


@pytest.mark.parametrize("seed", [0, 3])
def test_validate_render_matches_reference_oracle(rng, seed):
    cfg = ModelConfig(n_levels=2, n_channels=2, log2_table_size=10,
                      n_samples=24, sample_l=1.0 / 6.0,
                      bf16_features=False, sampler_mode="dense",
                      hash_mode="xor")
    params, consts = renderer.init(jax.random.key(seed), cfg, 2)
    # bump feat pool scale so densities/colors are non-trivial
    params = dict(params)
    params["field"] = dict(params["field"])
    params["field"]["feat_pool"] = (
        params["field"]["feat_pool"] * 2e4
        + jax.random.normal(jax.random.key(seed + 10),
                            params["field"]["feat_pool"].shape))

    r = np.random.default_rng(seed)
    rays_o = r.normal(0, 0.4, (12, 3)).astype(np.float32)
    rays_d = r.normal(0, 1, (12, 3)).astype(np.float32)

    res = renderer.render(params, consts, jnp.asarray(rays_o),
                          jnp.asarray(rays_d), None, cfg, None,
                          train=False)
    e_rgb, e_depth, e_w = _reference_render_np(
        params, consts, cfg, rays_o, rays_d)

    np.testing.assert_allclose(np.asarray(res.colors), e_rgb,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.depths), e_depth,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.weights), e_w,
                               rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_paged_vs_xor_same_architecture(rng):
    """Paged and XOR modes are different hash layouts of the same model
    family: with matched init scales both must produce finite, sane
    renders of the same magnitude (sanity cross-check, not equality)."""
    base = dict(n_levels=2, n_channels=2, log2_table_size=10,
                n_samples=16, sample_l=1.0 / 4.0, bf16_features=False,
                sampler_mode="dense")
    rays_o = jnp.asarray(rng.normal(0, 0.3, (6, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(0, 1, (6, 3)).astype(np.float32))
    outs = {}
    for mode in ("xor", "paged"):
        cfg = ModelConfig(hash_mode=mode, **base)
        params, consts = renderer.init(jax.random.key(0), cfg, 2)
        res = renderer.render(params, consts, rays_o, rays_d, None, cfg,
                              None, train=False)
        assert bool(jnp.isfinite(res.colors).all())
        outs[mode] = np.asarray(res.colors)
    # near-init both render close to the background
    assert np.abs(outs["xor"] - outs["paged"]).max() < 0.1
