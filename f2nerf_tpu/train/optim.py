"""Optimizer and LR schedule.

Reference optimizer setup (src/hash_3d_anchored.cpp:90-114,
src/sh_shader.cpp:31-40, src/renderer.cpp:177-196): Adam with
betas (0.9, 0.99), eps 1e-15; weight decay 1e-6 on the MLPs and the
appearance embedding but **not** on the hash feature pool. Torch Adam's
weight decay is *coupled* (added to the gradient before the moment
updates), so we use add_decayed_weights before scale_by_adam, not adamw.

LR schedule (src/main_functions/train_manager.cpp:160-176): linear warmup
over the first ``warm_up`` iters, then cosine decay to ``alpha`` * lr.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax

from f2nerf_tpu.core.config import TrainConfig


def lr_schedule(cfg: TrainConfig):
    """lr factor as a function of the step (reference update_ada_params)."""
    warm = cfg.learning_rate_warm_up_end_iter
    alpha = cfg.learning_rate_alpha

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_factor = step / warm
        progress = (step - warm) / max(cfg.end_iter - warm, 1)
        cos_factor = ((1.0 - alpha)
                      * (jnp.cos(progress * jnp.pi) * 0.5 + 0.5) + alpha)
        factor = jnp.where(step >= warm, cos_factor, warm_factor)
        return cfg.learning_rate * factor

    return schedule


def _is_feat_pool(path) -> bool:
    return any(getattr(p, "key", None) == "feat_pool" for p in path)


def _wd_mask(params: Any) -> Any:
    """True where weight decay applies: everything except the hash
    feature pool (reference hash_3d_anchored.cpp:93-101 first group has
    no weight_decay)."""
    import jax
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_feat_pool(path), params)


def _pool_mask(params: Any) -> Any:
    import jax
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_feat_pool(path), params)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    steps = []
    if cfg.grad_clip_norm > 0.0:
        # net-new vs the reference (which has no clipping): a guard for
        # the edge-of-stability oscillation large-batch runs can hit in
        # the sustained high-LR phase
        steps.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    steps.append(
        optax.masked(optax.add_decayed_weights(1e-6), _wd_mask))
    if cfg.feat_pool_weight_decay > 0.0:
        # net-new vs the reference (whose pool group has NO decay): the
        # occupancy sampler only supervises cells it samples, and hash
        # collisions inject density into never-sampled cells — without a
        # prior pulling unsupervised features to zero, that density
        # compounds over long runs (sigma-EMA p50 hit the 1e4 ceiling by
        # 11k steps in the round-2 20k run). Supervised features are
        # re-pushed every step, so a small coupled decay only erases
        # what nothing supports. Dense-sampler runs don't need it (every
        # cell along every ray is supervised — the fork's design).
        steps.append(optax.masked(
            optax.add_decayed_weights(cfg.feat_pool_weight_decay),
            _pool_mask))
    steps += [
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
        optax.scale_by_learning_rate(lr_schedule(cfg)),
    ]
    return optax.chain(*steps)
