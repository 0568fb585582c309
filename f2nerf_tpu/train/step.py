"""Jitted training step: rays -> render -> losses -> Adam update.

Reference hot loop: ``src/main_functions/train_manager.cpp:58-158`` —
Charbonnier color loss ``sqrt((dc)^2 + 1e-4).mean()`` (:78) plus a ramped
weight-variance distortion loss ``sqrt(var + 1e-2).mean()`` (:80-93).

TPU-first differences from the reference loop (SURVEY.md §3.1):
* ray generation happens *inside* the jitted step from device-resident
  poses/intrinsics — the host only ships (cam_idx, ij, gt) per step;
* metrics stay on device and are fetched asynchronously by the loop —
  no per-iteration ``.item()`` device syncs;
* the PRNG is a counter-based fold of (seed, step) so results are
  independent of how many steps ran per host dispatch.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from f2nerf_tpu.core.cameras import rays_from_pose
from f2nerf_tpu.core.config import Config
from f2nerf_tpu.models import renderer
from f2nerf_tpu.ops.composite import distortion_loss, weight_variance


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    color_loss: jnp.ndarray
    var_loss: jnp.ndarray
    mse: jnp.ndarray
    psnr: jnp.ndarray


def var_loss_weight(step: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Ramp 0 -> var_loss_weight over [var_loss_start, var_loss_end]
    (reference train_manager.cpp:85-93, strict > comparisons)."""
    t = cfg.train
    lin = ((step - t.var_loss_start)
           / max(t.var_loss_end - t.var_loss_start, 1)
           * t.var_loss_weight)
    w = jnp.where(step > t.var_loss_end, t.var_loss_weight,
                  jnp.where(step > t.var_loss_start, lin, 0.0))
    return w.astype(jnp.float32)


def make_loss_fn(cfg: Config, encode_fn=None):
    """Loss over a ray batch given (cam_idx, ij, gt)."""

    def loss_fn(params, consts, poses, intrinsics, cam_idx, ij, gt,
                key, step, occ_bits):
        sel_poses = poses[cam_idx]               # [B, 3, 4]
        sel_intr = intrinsics[cam_idx]           # [B, 3, 3]
        rays_o, rays_d = rays_from_pose(sel_poses, sel_intr,
                                        ij.astype(jnp.float32))
        la = cfg.train.level_anneal_end
        if la > 0:
            # coarse-to-fine: level l's weight ramps linearly over
            # steps [la*(l-1)/L, la*l/L] — level 0 is fully on from
            # step 0 and the whole anneal finishes at la*(L-1)/L,
            # slightly before level_anneal_end (ADVICE r2: the comment,
            # not the formula, was wrong)
            nl = cfg.model.n_levels
            prog = jnp.clip(step.astype(jnp.float32) / la, 0.0, 1.0)
            lw = jnp.clip(prog * nl - jnp.arange(nl, dtype=jnp.float32)
                          + 1.0, 0.0, 1.0)
        else:
            lw = None
        # train_app_emb=False: render without the per-image appearance
        # embedding. On appearance-constant captures the embeddings
        # otherwise act as 16 free per-view parameters and absorb
        # scene information only their own view can use — measured
        # 3.6 dB of train-render PSNR on the round-4 48-view textured
        # checkpoint (own-emb 31.3 vs none 27.7, BENCH_NOTES r5) that
        # holdout views never see. The reference always scatters the
        # embedding (src/renderer.cpp:100-104).
        emb_idx = cam_idx if cfg.train.train_app_emb else None
        res = renderer.render(params, consts, rays_o, rays_d, emb_idx,
                              cfg.model, key, train=True,
                              encode_fn=encode_fn, occ_bits=occ_bits,
                              point_grads=False, level_weights=lw)
        # Charbonnier color loss (train_manager.cpp:78)
        color_loss = jnp.mean(
            jnp.sqrt((res.colors - gt) ** 2 + 1e-4))
        if cfg.train.var_loss_mode == "distortion":
            # normalized mip-NeRF-360-style distortion (plain mean —
            # the loss is already bounded by construction)
            march = cfg.model.n_samples * cfg.model.sample_l
            var_loss = jnp.mean(distortion_loss(
                res.weights, res.t, res.dt, res.mask, march))
        else:
            # Weight-variance loss (train_manager.cpp:80-84); spatial
            # positions t/(sample_l*16) == the reference's i/16 for its
            # uniform march, and the spatially-correct generalization
            # for the occupancy sampler (slot index != distance there)
            var = weight_variance(res.weights, res.mask,
                                  pos=res.t / (cfg.model.sample_l * 16.0))
            var_loss = jnp.mean(jnp.sqrt(var + 1e-2))
        w = var_loss_weight(step, cfg)
        loss = color_loss + var_loss * w
        if (cfg.train.explore_sparsity_weight > 0.0
                and res.explore is not None):
            # explore-sparsity loss: push down the optical depth of
            # samples in occupied-but-ineligible segments — exactly the
            # hash-collision fog behind the transmittance horizon that
            # no color gradient reaches (the long-horizon density
            # runaway, BENCH_NOTES.md). log1p keeps the gradient alive
            # for exploded fog (alpha-form saturates: d(1-e^-x)/dx -> 0
            # while d log1p(x)/dx = 1/(1+x)); the clip guards inf sigma
            # from TruncExp's unbounded forward.
            m = res.explore.astype(jnp.float32)
            fog = jnp.log1p(jnp.clip(res.sec_density, 0.0, 1e4)) * m
            exp_loss = jnp.sum(fog) / jnp.maximum(jnp.sum(m), 1.0)
            loss = loss + cfg.train.explore_sparsity_weight * exp_loss
        if cfg.train.occ_reg_weight > 0.0 and cfg.train.occ_reg_t > 0.0:
            # occlusion regularizer (TrainConfig.occ_reg_weight): mean
            # clipped optical depth of near-march samples — suppresses
            # the per-camera billboard minimum so transmittance (and
            # with it, gradient flow) reaches the real surface.
            # Restricted to the survivor mask: that is where
            # sec_density is defined under BOTH render paths (the dense
            # two-pass zeroes the post-termination tail — RenderResult
            # contract note), and the billboard itself is always
            # pre-termination, so the term's target is unaffected.
            near_m = ((res.t < cfg.train.occ_reg_t)
                      & (res.dt > 0.0) & res.mask).astype(jnp.float32)
            occ_reg = (jnp.sum(jnp.clip(res.sec_density, 0.0, 1e4)
                               * near_m)
                       / jnp.maximum(jnp.sum(near_m), 1.0))
            loss = loss + cfg.train.occ_reg_weight * occ_reg
        if cfg.train.global_sparsity_weight > 0.0:
            # volume-wide density prior at random contracted-domain
            # points: reaches the hash-collision garbage in space no
            # train ray traverses (TrainConfig.global_sparsity_weight
            # rationale; novel-pose renders look through that space)
            from f2nerf_tpu.models import renderer as renderer_mod
            k_gs = jax.random.fold_in(key, 0x675)
            n_gs = cfg.train.global_sparsity_points
            # contracted domain = open ball of radius 1 + r
            # (ops/contraction.py: |x| <= r identity, else -> 1 + r)
            dom_r = 1.0 + cfg.model.contraction_radius
            gpts = jax.random.uniform(k_gs, (n_gs, 3),
                                      minval=-dom_r, maxval=dom_r)
            in_dom = (jnp.linalg.norm(gpts, axis=-1)
                      < dom_r * 0.999).astype(jnp.float32)
            sig_gs = renderer_mod.density_at(params, consts, gpts,
                                             cfg.model, contracted=True)
            gs = jnp.log1p(jnp.clip(sig_gs, 0.0, 1e4)) * in_dom
            gs_loss = jnp.sum(gs) / jnp.maximum(jnp.sum(in_dom), 1.0)
            loss = loss + cfg.train.global_sparsity_weight * gs_loss

        mse = jnp.mean((res.colors - gt) ** 2)
        psnr = 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))
        aux = StepMetrics(loss=loss, color_loss=color_loss,
                          var_loss=var_loss, mse=mse, psnr=psnr)
        return loss, aux

    return loss_fn


def _block_grads(cfg, scaled_loss, params, consts, poses, intrinsics,
                 cam_idx, ij, gt, key, step, occ_bits, mesh):
    """Shard-count-invariant gradients (TrainConfig.grad_blocks = V).

    The batch is reshaped to [V, B/V]; each block's gradient is an
    independent vmap instance whose internal reductions span only that
    block, so its value does not depend on how blocks map to devices.
    The stacked [V, ...] block gradients are then forced replicated
    (one all-gather) and reduced with the same fixed-shape [V, ...] sum
    on every device — identical floating-point grouping for every mesh
    size k dividing V, unlike psum whose partial-sum grouping follows k.
    """
    V = cfg.train.grad_blocks
    B = cam_idx.shape[0]
    if B % V != 0:
        raise ValueError(f"grad_blocks={V} must divide rays/step={B}")

    def block_grad(c, i, g, bidx):
        def f(p):
            return scaled_loss(p, consts, poses, intrinsics, c, i, g,
                               jax.random.fold_in(key, bidx), step,
                               occ_bits)
        return jax.value_and_grad(f, has_aux=True)(params)

    (_, aux), gb = jax.vmap(block_grad)(
        cam_idx.reshape(V, -1), ij.reshape(V, -1, 2),
        gt.reshape(V, -1, 3), jnp.arange(V, dtype=jnp.uint32))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        repl = NamedSharding(mesh, PartitionSpec())
        gb = jax.tree_util.tree_map(
            lambda g: jax.lax.with_sharding_constraint(g, repl), gb)
    grads = jax.tree_util.tree_map(
        lambda g: jnp.sum(g, axis=0) / V, gb)
    # per-block means of equal-sized blocks average to the global mean;
    # psnr is recomputed from the averaged mse (log of the mean, not
    # the mean of logs)
    mse = jnp.mean(aux.mse)
    metrics = StepMetrics(loss=jnp.mean(aux.loss),
                          color_loss=jnp.mean(aux.color_loss),
                          var_loss=jnp.mean(aux.var_loss), mse=mse,
                          psnr=20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))
    return grads, metrics


def make_train_step(cfg: Config, optimizer: optax.GradientTransformation,
                    encode_fn=None, mesh=None):
    """Build the (un-jitted) train step; jit/shard at the call site.

    State threading: ``occ_grid`` (the occupancy density-EMA) rides
    along and refreshes every cfg.model.occ_update_every steps under a
    lax.cond; pass occ_grid=None semantics via sampler_mode='dense'.

    ``mesh`` is only needed for the grad_blocks shard-invariant mode
    (the replication constraint on the block-gradient stack).
    """
    from f2nerf_tpu.models import occupancy

    loss_fn = make_loss_fn(cfg, encode_fn=encode_fn)
    use_occ = cfg.model.sampler_mode == "occ"

    def train_step(params: Any, opt_state: Any, occ_grid: jnp.ndarray,
                   consts: Any,
                   poses: jnp.ndarray, intrinsics: jnp.ndarray,
                   step: jnp.ndarray, cam_idx: jnp.ndarray,
                   ij: jnp.ndarray, gt: jnp.ndarray):
        key = jax.random.fold_in(
            jax.random.key(cfg.train.seed), step.astype(jnp.uint32))
        if use_occ:
            k_occ, key = jax.random.split(key)
            every = cfg.model.occ_update_every
            k_ph = cfg.model.occ_refresh_phases
            # While the field evolves fast (early training), run the
            # 1/K partial refresh K times as often — same query rate as
            # a full refresh but fresher in time; after the warmup drop
            # to the slow cadence (1/K of the full-refresh cost).
            fast_every = max(every // k_ph, 1)
            warm = step < cfg.model.occ_refresh_warmup
            cadence = jnp.where(warm, fast_every, every)

            def refresh(grid):
                phase = (step // cadence) % k_ph
                return occupancy.update_grid(
                    grid,
                    lambda pts: renderer.density_at(
                        params, consts, pts, cfg.model, contracted=True),
                    k_occ, cfg.model, phase=phase)

            occ_grid = jax.lax.cond(
                step % cadence == 0, refresh, lambda g: g, occ_grid)
            # sigma-valued occupancy; warmup forces everything occupied
            occ_bits = occupancy.occ_values(
                occ_grid, cfg.model,
                warmup=step < cfg.model.occ_warmup_steps)
        else:
            occ_bits = None
        scale = float(cfg.train.loss_scale)

        def scaled_loss(*a):
            # static loss scaling (reference fp16 kernels' x128,
            # hash_3d_anchored.cu:190-215); metrics stay unscaled
            loss, aux = loss_fn(*a)
            return loss * scale, aux

        if cfg.train.grad_blocks > 0:
            grads, metrics = _block_grads(
                cfg, scaled_loss, params, consts, poses, intrinsics,
                cam_idx, ij, gt, key, step, occ_bits, mesh)
        else:
            (_, metrics), grads = jax.value_and_grad(
                scaled_loss, has_aux=True)(
                params, consts, poses, intrinsics, cam_idx, ij, gt, key,
                step, occ_bits)
        if scale != 1.0:
            grads = jax.tree_util.tree_map(lambda g: g / scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, occ_grid, metrics

    return train_step
