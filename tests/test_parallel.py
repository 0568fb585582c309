"""Multi-device tests on the 8-device CPU mesh: sharded train step
executes, matches single-device numerics, and hash gradients are
deterministic across shard counts (BASELINE.md requirement)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from f2nerf_tpu.models import occupancy, renderer
from f2nerf_tpu.train.optim import make_optimizer
from f2nerf_tpu.train.step import make_train_step


def _setup(cfg, batch):
    params, consts = renderer.init(jax.random.key(0), cfg.model, 4)
    opt = make_optimizer(cfg.train)
    opt_state = opt.init(params)
    occ = occupancy.init_grid(cfg.model)
    poses = jnp.tile(jnp.eye(3, 4)[None], (4, 1, 1))
    intr = jnp.tile(jnp.asarray(
        [[20.0, 0, 12.0], [0, 20.0, 12.0], [0, 0, 1.0]])[None],
        (4, 1, 1))
    rng = np.random.default_rng(0)
    cam = rng.integers(0, 4, batch).astype(np.int32)
    ij = rng.integers(0, 24, (batch, 2)).astype(np.int32)
    gt = rng.random((batch, 3)).astype(np.float32)
    return params, opt, opt_state, occ, consts, poses, intr, cam, ij, gt


def _run_step(cfg, n_devices, batch):
    (params, opt, opt_state, occ, consts, poses, intr,
     cam, ij, gt) = _setup(cfg, batch)
    if n_devices == 1:
        step_fn = jax.jit(make_train_step(cfg, opt))
        return step_fn(params, opt_state, occ, consts, poses, intr,
                       jnp.asarray(0, jnp.int32), cam, ij, gt)
    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
    step_fn = jax.jit(make_train_step(cfg, opt, mesh=mesh))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    occ = jax.device_put(occ, repl)
    consts = jax.device_put(consts, repl)
    cam = jax.device_put(cam, shard)
    ij = jax.device_put(ij, shard)
    gt = jax.device_put(gt, shard)
    return step_fn(params, opt_state, occ, consts,
                   jax.device_put(poses, repl),
                   jax.device_put(intr, repl),
                   jnp.asarray(0, jnp.int32), cam, ij, gt)


@pytest.mark.parametrize(
    "n_devices",
    [2, pytest.param(8, marks=pytest.mark.slow)])
def test_sharded_matches_single_device(tiny_cfg, n_devices):
    """Rays sharded over the data axis must reproduce single-device
    results (deterministic scatter-add across shard counts)."""
    p1, o1, g1, m1 = _run_step(tiny_cfg, 1, 64)
    pn, on, gn, mn = _run_step(tiny_cfg, n_devices, 64)
    np.testing.assert_allclose(float(m1.loss), float(mn.loss),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-4)


def test_sharded_run_twice_bitwise_identical(tiny_cfg):
    pa = _run_step(tiny_cfg, 8, 64)
    pb = _run_step(tiny_cfg, 8, 64)
    for a, b in zip(jax.tree.leaves(pa[0]), jax.tree.leaves(pb[0])):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_grad_blocks_bitwise_across_shard_counts(tiny_cfg):
    """TrainConfig.grad_blocks=V makes the parameter update BITWISE
    identical across mesh sizes k | V (BASELINE.md: hash-grid
    scatter-add gradient 'deterministic across runs and shard counts').
    Per-block gradients are shard-placement-independent and the [V,...]
    reduction has the same floating-point grouping at every k."""
    cfg = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(tiny_cfg.train, grad_blocks=8))
    ref = _run_step(cfg, 1, 64)
    for k in (2, 8):
        out = _run_step(cfg, k, 64)
        for a, b in zip(jax.tree.leaves(ref[0]), jax.tree.leaves(out[0])):
            assert np.array_equal(np.asarray(a), np.asarray(b)), \
                f"params differ at mesh size {k}"


@pytest.mark.slow
def test_grad_blocks_occ_mode_runs(occ_cfg):
    """grad_blocks composes with the occupancy sampler path."""
    cfg = dataclasses.replace(
        occ_cfg, train=dataclasses.replace(occ_cfg.train, grad_blocks=4))
    p, o, g, m = _run_step(cfg, 2, 64)
    assert np.isfinite(float(m.loss))


def test_occ_mode_sharded(occ_cfg):
    p, o, g, m = _run_step(occ_cfg, 8, 64)
    assert np.isfinite(float(m.loss))


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_mesh_helpers():
    from f2nerf_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh()
    assert mesh.shape["data"] == 8
    arrs = mesh_lib.shard_batch(mesh, np.zeros((16, 3), np.float32))
    assert arrs[0].sharding.spec == P("data")
    tree = mesh_lib.replicate(mesh, {"a": np.ones(3, np.float32)})
    assert tree["a"].sharding.spec == P()


def test_sharded_render_image_matches_single(tiny_cfg):
    """render_image(mesh=...) shards rays across chips and must match
    the single-device render exactly (VALIDATE mode is deterministic)."""
    from f2nerf_tpu.parallel import mesh as mesh_lib

    key = jax.random.key(0)
    params, consts = renderer.init(key, tiny_cfg.model, 4)
    pose = jnp.eye(3, 4)
    intr = jnp.asarray([[20.0, 0, 12.0], [0, 20.0, 12.0], [0, 0, 1.0]])
    single = renderer.render_image(params, consts, pose, intr, 24, 24,
                                   tiny_cfg.model, chunk=100)
    mesh = mesh_lib.make_mesh()
    # chunk=100 is not divisible by 8 — exercises the round-up
    sharded = renderer.render_image(params, consts, pose, intr, 24, 24,
                                    tiny_cfg.model, chunk=100, mesh=mesh)
    np.testing.assert_allclose(np.asarray(single[0]),
                               np.asarray(sharded[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(single[1]),
                               np.asarray(sharded[1]), atol=1e-5)
