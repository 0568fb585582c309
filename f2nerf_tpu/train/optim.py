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


def _wd_mask(params: Any) -> Any:
    """True where weight decay applies: everything except the hash
    feature pool (reference hash_3d_anchored.cpp:93-101 first group has
    no weight_decay)."""
    import jax
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: not any(
            getattr(p, "key", None) == "feat_pool" for p in path),
        params)
    return flat


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    steps = []
    if cfg.grad_clip_norm > 0.0:
        # net-new vs the reference (which has no clipping): a guard for
        # the edge-of-stability oscillation large-batch runs can hit in
        # the sustained high-LR phase
        steps.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    steps += [
        optax.masked(optax.add_decayed_weights(1e-6), _wd_mask),
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
        optax.scale_by_learning_rate(lr_schedule(cfg)),
    ]
    return optax.chain(*steps)
