"""Parameter-GRADIENT parity vs an independent torch-autograd oracle.

BASELINE.md asks for per-pixel parameter gradients "allclose vs the
mounted CUDA build (fp32 parity mode)". The CUDA build cannot run here,
so this implements the reference pipeline a third time (after the jax
implementation and the numpy forward oracle of test_e2e_parity) in
torch-CPU — reference semantics, reference autograd engine — and
compares d(Charbonnier loss)/d(params) for every trainable tensor:
feat_pool, hash-head MLP, shader MLP.

Reference lines exercised: XOR hash encode + trilinear
(hash_3d_anchored.cu:61-93), TruncExp density (CustomOps.cpp:10-20),
SH shading (sh_shader.cu:11-115, sh_shader.cpp:22-29), two-pass
early-stop compositing (renderer.cpp:58-122), Charbonnier color loss
(train_manager.cpp:78).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess/multi-process drivers (pytest.ini)

torch = pytest.importorskip("torch")

from f2nerf_tpu.core.config import ModelConfig
from f2nerf_tpu.models import renderer


def _hash_gather_plan(points, primes, biases, scales, tsize):
    """Precompute the (table_index, trilinear_weight) pairs per (point,
    level, corner) — they depend only on ray geometry, not on params, so
    the oracle's encode becomes a differentiable gather-accumulate."""
    n = points.shape[0]
    n_lvl = scales.shape[0]
    idx = np.zeros((n, n_lvl, 8), np.int64)
    w = np.zeros((n, n_lvl, 8), np.float64)
    for k in range(n):
        for lvl in range(n_lvl):
            pt = points[k] * scales[lvl] + biases[lvl]
            f = np.floor(pt)
            fr = pt - f
            ip = np.maximum(f, 0.0).astype(np.uint32)
            c = 0
            for dx in range(2):
                for dy in range(2):
                    for dz in range(2):
                        h = int((np.uint32(ip[0] + dx) * primes[lvl, 0])
                                ^ (np.uint32(ip[1] + dy) * primes[lvl, 1])
                                ^ (np.uint32(ip[2] + dz) * primes[lvl, 2])
                                ) % tsize
                        idx[k, lvl, c] = h
                        w[k, lvl, c] = (
                            (fr[0] if dx else 1 - fr[0])
                            * (fr[1] if dy else 1 - fr[1])
                            * (fr[2] if dz else 1 - fr[2]))
                        c += 1
    return idx, w


def _contract_np(p):
    n = np.linalg.norm(p, axis=-1, keepdims=True)
    return np.where(n <= 1.0, p, (1.0 + 1.0 - 1.0 / n) * p / n)


def _torch_render_loss(tp, plan, sh_basis, cfg, r, s, t, dt, gt):
    """Reference pipeline in torch; returns the Charbonnier loss."""
    idx, w = plan
    n_lvl = idx.shape[1]
    # encode: gather 8 corners per (point, level), weight, sum
    rows = tp["feat_pool"].reshape(n_lvl * tp["feat_pool"].shape[1], -1)
    flat_idx = torch.as_tensor(
        idx + np.arange(n_lvl)[None, :, None] * tp["feat_pool"].shape[1])
    gathered = rows[flat_idx.reshape(-1)].reshape(*idx.shape, -1)
    enc = (gathered * torch.as_tensor(w)[..., None].float()).sum(2)
    enc = enc.reshape(idx.shape[0], -1)                   # [R*S, L*C]

    feat = enc @ tp["mlp_w"] + tp["mlp_b"]
    sigma = torch.exp(feat[:, 0] - cfg.density_shift)     # TruncExp fwd
    shading = torch.cat([torch.ones_like(feat[:, :1]), feat[:, 1:]], 1)
    x = torch.cat([shading, torch.as_tensor(sh_basis).float()], 1)
    h = torch.relu(x @ tp["w0"] + tp["b0"])
    out = h @ tp["w1"] + tp["b1"]
    eps = 1e-3
    colors = (1 + 2 * eps) / (1 + torch.exp(-out)) - eps  # [R*S, 3]

    sec = sigma.reshape(r, s) * torch.as_tensor(dt).float()
    colors = colors.reshape(r, s, 3)
    rgb_rows = []
    for i in range(r):
        # two-pass early stop: keep the prefix with trans > eps
        acc = torch.cat([torch.zeros(1), torch.cumsum(sec[i], 0)[:-1]])
        keep = (torch.exp(-acc) > cfg.trans_eps).detach()
        sd = sec[i][keep]
        acc2 = torch.cat([torch.zeros(1), torch.cumsum(sd, 0)[:-1]])
        wgt = torch.exp(-acc2) * (1.0 - torch.exp(-sd))
        last_trans = torch.exp(-sd.sum())
        rgb_rows.append((wgt[:, None] * colors[i][keep]).sum(0)
                        + last_trans * 0.5)
    rgb = torch.stack(rgb_rows)
    return torch.sqrt((rgb - torch.as_tensor(gt).float()) ** 2
                      + 1e-4).mean()


def test_parameter_gradients_match_torch_oracle():
    cfg = ModelConfig(n_levels=2, n_channels=2, log2_table_size=10,
                      n_samples=24, sample_l=1.0 / 6.0,
                      bf16_features=False, sampler_mode="dense",
                      hash_mode="xor")
    params, consts = renderer.init(jax.random.key(0), cfg, 2)
    # non-trivial densities/colors
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["field"]["feat_pool"] = (
        params["field"]["feat_pool"] * 2e4
        + jax.random.normal(jax.random.key(7),
                            params["field"]["feat_pool"].shape))

    rng = np.random.default_rng(1)
    r, s = 10, cfg.n_samples
    rays_o = rng.normal(0, 0.4, (r, 3)).astype(np.float32)
    rays_d = rng.normal(0, 1.0, (r, 3)).astype(np.float32)
    gt = rng.random((r, 3)).astype(np.float32)

    # jax side: VALIDATE render -> Charbonnier
    def loss_fn(p):
        res = renderer.render(p, consts, jnp.asarray(rays_o),
                              jnp.asarray(rays_d), None, cfg, None,
                              train=False)
        return jnp.mean(jnp.sqrt((res.colors - gt) ** 2 + 1e-4))

    jax_grads = jax.grad(loss_fn)(params)

    # torch side: same geometry precomputed
    dirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = np.cumsum(np.ones((r, s)), axis=1) * cfg.sample_l
    pts = rays_o[:, None, :] + dirs[:, None, :] * t[..., None]
    dt = np.diff(t, axis=1, prepend=t[:, :1])
    dt[:, 0] = 0.0
    flat = _contract_np(pts.reshape(-1, 3)).astype(np.float32)
    plan = _hash_gather_plan(flat, np.asarray(consts["field"]["primes"]),
                             np.asarray(consts["field"]["biases"]),
                             np.asarray(consts["field"]["scales"]),
                             cfg.table_size)
    from tests.test_e2e_parity import _sh_np
    sh_basis = _sh_np(np.repeat(dirs, s, axis=0))

    tp = {
        "feat_pool": torch.tensor(
            np.asarray(params["field"]["feat_pool"], np.float32),
            requires_grad=True),
        "mlp_w": torch.tensor(
            np.asarray(params["field"]["mlp"]["w"], np.float32),
            requires_grad=True),
        "mlp_b": torch.tensor(
            np.asarray(params["field"]["mlp"]["b"], np.float32),
            requires_grad=True),
        "w0": torch.tensor(np.asarray(params["shader"]["w0"], np.float32),
                           requires_grad=True),
        "b0": torch.tensor(np.asarray(params["shader"]["b0"], np.float32),
                           requires_grad=True),
        "w1": torch.tensor(np.asarray(params["shader"]["w1"], np.float32),
                           requires_grad=True),
        "b1": torch.tensor(np.asarray(params["shader"]["b1"], np.float32),
                           requires_grad=True),
    }
    loss = _torch_render_loss(tp, plan, sh_basis, cfg, r, s, t, dt, gt)
    loss.backward()

    pairs = [
        ("feat_pool", jax_grads["field"]["feat_pool"], tp["feat_pool"]),
        ("mlp_w", jax_grads["field"]["mlp"]["w"], tp["mlp_w"]),
        ("mlp_b", jax_grads["field"]["mlp"]["b"], tp["mlp_b"]),
        ("w0", jax_grads["shader"]["w0"], tp["w0"]),
        ("b0", jax_grads["shader"]["b0"], tp["b0"]),
        ("w1", jax_grads["shader"]["w1"], tp["w1"]),
        ("b1", jax_grads["shader"]["b1"], tp["b1"]),
    ]
    for name, jg, tt in pairs:
        jg = np.asarray(jg)
        tg = tt.grad.numpy()
        scale = max(float(np.abs(tg).max()), 1e-12)
        np.testing.assert_allclose(
            jg, tg, rtol=2e-3, atol=1e-3 * scale,
            err_msg=f"gradient mismatch for {name}")
