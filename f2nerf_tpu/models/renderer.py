"""Volume renderer: sampler -> hash field -> SH shader -> compositing.

Reference: ``src/renderer.{hpp,cpp}`` (Renderer::render / render_all_rays /
render_image). The reference's two-pass early-stop compaction is replaced
by a single dense masked pass (see f2nerf_tpu/ops/composite.py); because
density values are identical in both of the reference's passes, the single
pass is mathematically exact *and* cheaper (the reference queries the full
sample set in pass 1 plus survivors again in pass 2).

Owns the per-image appearance embedding ``app_emb`` [n_images, 16]
~ 0.1*N(0,1) added to the shading features in TRAIN mode
(src/renderer.cpp:28-30,100-104).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from f2nerf_tpu.core.config import ModelConfig
from f2nerf_tpu.models import hash_field, sampler, sh_shader
from f2nerf_tpu.ops.composite import composite, density_activation

Params = dict[str, Any]


class RenderResult(NamedTuple):
    colors: jnp.ndarray   # [R, 3]
    depths: jnp.ndarray   # [R]
    weights: jnp.ndarray  # [R, S] (zero outside the keep mask)
    mask: jnp.ndarray     # [R, S] bool keep mask
    t: jnp.ndarray        # [R, S] sample distances (for spatial losses)
    dt: jnp.ndarray       # [R, S] sample interval widths (0 = invalid)
    # per-sample optical depth sigma*dt (0 where invalid) and the
    # occupied-but-ineligible sample flag from the occ sampler (None for
    # the dense sampler) — inputs to the explore-sparsity loss.
    # CONTRACT NOTE: the dense two-pass path returns sec_density ZEROED
    # outside the trans_eps survivor prefix (pass 2 never queries the
    # tail), while the single pass returns sigma*dt for every dt>0
    # sample. Consumers must mask by `mask` before relying on tail
    # values; both current consumers comply (explore-sparsity is
    # occ-mode only, where two-pass never runs; the occlusion
    # regularizer masks explicitly, train/step.py). Equivalence-tested
    # as sec_density * mask (tests/test_renderer.py).
    sec_density: jnp.ndarray | None = None  # [R, S]
    explore: jnp.ndarray | None = None      # [R, S] bool


def init(key: jax.Array, cfg: ModelConfig, n_images: int,
         np_seed: int = 2022) -> tuple[Params, Params]:
    """Returns (trainable params, non-trained consts)."""
    k_field, k_shader, k_emb = jax.random.split(key, 3)
    field_params, field_consts = hash_field.init(k_field, cfg,
                                                 np_seed=np_seed)
    params = {
        "field": field_params,
        "shader": sh_shader.init(k_shader, cfg),
        "app_emb": jax.random.normal(k_emb, (n_images, cfg.app_emb_dim))
        * 0.1,
    }
    consts = {"field": field_consts}
    return params, consts


def density_at(params: Params, consts: Params, points: jnp.ndarray,
               cfg: ModelConfig, contracted: bool = False) -> jnp.ndarray:
    """[N, 3] points -> [N] sigma (used by the occupancy-grid refresh;
    pass contracted=True for points already in contracted space, e.g.
    occupancy cell centers, to avoid double contraction)."""
    feat = hash_field.query(params["field"], consts.get("field", {}),
                            points, cfg, pre_contracted=contracted)
    return density_activation(feat[..., 0], cfg.density_shift)


def render(params: Params, consts: Params, rays_o: jnp.ndarray,
           rays_d: jnp.ndarray,
           emb_idx: jnp.ndarray | None, cfg: ModelConfig,
           key: jax.Array | None, train: bool,
           encode_fn=None, occ_bits: jnp.ndarray | None = None,
           point_grads: bool = True,
           level_weights: jnp.ndarray | None = None,
           eval_emb: jnp.ndarray | None = None) -> RenderResult:
    """Render a batch of rays.

    Args:
      rays_o, rays_d: [R, 3] ray origins/directions (dirs need not be unit).
      emb_idx: [R] int32 per-ray image index for the appearance embedding
        (TRAIN only; ignored otherwise).
      key: PRNG key; TRAIN uses it for sample jitter + random background.
      train: TRAIN mode = stratified jitter, random background, app_emb.
        VALIDATE = no jitter, grey (0.5) background, no app_emb.
      encode_fn: optional hash-encode override (Pallas kernel).
      occ_bits: [G^3] occupancy bits; required when
        cfg.sampler_mode == 'occ'.
      point_grads: keep the encode's d_points backward path. Required
        for pose gradients (localizer differential mode); the train
        step passes False to drop the path entirely (XLA cannot DCE it
        through the chunked backward loop).
      eval_emb: optional [app_emb_dim] appearance vector added to the
        shading features in VALIDATE mode. The reference renders
        validation frames with NO appearance embedding
        (src/renderer.cpp:100-104 gates the scatter on TRAIN), which
        evaluates the shader off the manifold it trained on — every
        train sample saw `1 + feat + emb`. Passing the mean trained
        embedding (NeRF-W-style test-time appearance) restores the
        trained operating point; net-new vs the reference.
    """
    r = rays_o.shape[0]
    if train:
        key_noise, key_bg = jax.random.split(key)
        bg_color = jax.random.uniform(key_bg, (r, 3))
    else:
        key_noise = None
        bg_color = jnp.full((r, 3), 0.5)

    if cfg.sampler_mode == "occ":
        if occ_bits is None:
            raise ValueError("sampler_mode='occ' requires occ_bits")
        from f2nerf_tpu.models import occupancy
        smp = occupancy.sample_rays_occ(rays_o, rays_d, occ_bits, cfg,
                                        key_noise)
        s = cfg.occ_keep * cfg.occ_samples_per_segment
    else:
        smp = sampler.sample_rays(rays_o, rays_d, cfg, key_noise)
        s = cfg.n_samples

    two_pass = (train and cfg.sampler_mode == "dense"
                and cfg.dense_two_pass and s % 8 == 0)
    if two_pass:
        return _render_two_pass(params, consts, smp, emb_idx, bg_color,
                                cfg, train, encode_fn, point_grads,
                                level_weights)

    return _render_samples(params, consts, smp.pts, smp.dirs, smp.t,
                           smp.dt, getattr(smp, "explore", None),
                           emb_idx, bg_color, cfg, train, encode_fn,
                           point_grads, level_weights, eval_emb)


def _render_samples(params, consts, pts, ray_dirs, t, dt, explore,
                    emb_idx, bg_color, cfg, train, encode_fn,
                    point_grads, level_weights,
                    eval_emb=None) -> RenderResult:
    """Field query + shading + masked compositing over [R, S] samples."""
    r, s = pts.shape[0], pts.shape[1]
    feat = hash_field.query_rays(params["field"], consts["field"],
                                 pts, cfg, encode_fn=encode_fn,
                                 point_grads=point_grads,
                                 level_weights=level_weights)  # [R, S, F]

    sigma = density_activation(feat[..., 0], cfg.density_shift)  # [R, S']

    # shading feature: [1, feat_1..F-1] (renderer.cpp:95-99)
    shading_feat = jnp.concatenate(
        [jnp.ones_like(feat[..., :1]), feat[..., 1:]], axis=-1)
    if train and emb_idx is not None:
        shading_feat = shading_feat + params["app_emb"][emb_idx][:, None, :]
    elif not train and eval_emb is not None:
        shading_feat = shading_feat + eval_emb[None, None, :]

    dirs = jnp.broadcast_to(ray_dirs[:, None, :], (r, s, 3))
    colors = sh_shader.query(params["shader"], shading_feat, dirs, cfg)

    # where(dt > 0, ...) rather than a bare product: the TruncExp
    # density is unbounded and inf * 0 (dt_0 = 0 / invalid samples)
    # would inject NaN into the compositing cumsum
    sec_density = jnp.where(dt > 0.0, sigma * dt, 0.0)  # [R, S']
    rgb, depth, weights, mask = composite(
        sec_density, colors, t, bg_color, cfg.trans_eps)
    return RenderResult(colors=rgb, depths=depth, weights=weights,
                        mask=mask, t=t, dt=dt,
                        sec_density=sec_density,
                        explore=explore)


def _render_two_pass(params, consts, smp, emb_idx, bg_color, cfg, train,
                     encode_fn, point_grads, level_weights
                     ) -> RenderResult:
    """Dense TRAIN two-pass: the reference's early-stop compaction
    (renderer.cpp:58-88), restructured for static shapes.

    Pass 1 is gradient-free (the reference's pass-1 query feeds only
    integer survivor indices, so its autograd graph is pruned there
    too) and computes the survivor mask (transmittance > trans_eps).
    Like the reference's ragged CSR rebuild, the differentiable pass
    then runs on a gather-COMPACTED flat buffer whose size is the
    smallest bucket in {RS/8, RS/4, RS/2, RS} covering the TOTAL
    survivor count (lax.switch; each branch compiles once). A total
    budget — not a per-ray max — matters: on a trained field the mean
    survivor prefix is ~25% of S while the batch max exceeds 70%
    (BENCH_NOTES r3), so any per-ray-max scheme degenerates to full-S.
    Compacted samples keep ray-major order; compositing runs as
    deterministic per-ray segment sums, and masked-out samples
    contribute exactly zero to outputs and gradients — reproducing the
    masked single pass. The full bucket falls back to the plain single
    pass (paying only pass 1 extra) while the field is young and
    nothing terminates.
    """
    r, s = smp.pts.shape[0], smp.pts.shape[1]
    n = r * s

    # pass 1: density only, no gradients. Run-dedup is disabled here —
    # its win is the run-compressed backward (BENCH_NOTES/ROOFLINE:
    # fwd-only measures 41.7 ms dedup vs 38.5 flat at the dense point),
    # and a gradient-free pass has no backward to compress.
    import dataclasses as _dc
    cfg1 = _dc.replace(cfg, encode_dedup=False)
    pts1 = jax.lax.stop_gradient(smp.pts)
    feat1 = hash_field.query_rays(
        jax.lax.stop_gradient(params["field"]),
        jax.lax.stop_gradient(consts["field"]), pts1, cfg1,
        encode_fn=encode_fn, point_grads=False,
        level_weights=level_weights)
    sigma1 = density_activation(feat1[..., 0], cfg.density_shift)
    sec1 = jnp.where(smp.dt > 0.0, sigma1 * smp.dt, 0.0)
    from f2nerf_tpu.ops.composite import exclusive_cumsum
    trans1 = jnp.exp(-exclusive_cumsum(sec1, axis=-1))
    mask1 = trans1 > cfg.trans_eps                     # [R, S] prefix
    n_surv = jnp.sum(mask1.astype(jnp.int32))          # scalar

    # survivors first, ray-major order preserved — a stable partition
    # of the flat mask. Built with two cumsums + one unique-index
    # scatter instead of jnp.argsort (identical order; XLA sorts cost
    # tens of ms at R*S = 524k on TPU while cumsum+scatter is ~1 ms —
    # round-5 dense follow-through, VERDICT r4 #5)
    flat_mask = mask1.ravel()
    cum_in = jnp.cumsum(flat_mask.astype(jnp.int32))
    cum_out = jnp.cumsum((~flat_mask).astype(jnp.int32))
    pos = jnp.where(flat_mask, cum_in - 1, n_surv + cum_out - 1)
    order = jnp.zeros((n,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32))

    flat_t, flat_dt = smp.t.ravel(), smp.dt.ravel()
    flat_pts = smp.pts.reshape(n, 3)

    def compact_branch(nb):
        def branch(_):
            idx = order[:nb]                           # [NB]
            ray_id = idx // s                          # [NB]
            valid = jnp.arange(nb) < n_surv            # [NB]
            pts = flat_pts[idx]
            t = flat_t[idx]
            dt = jnp.where(valid, flat_dt[idx], 0.0)
            if cfg.dense_two_pass_dedup and encode_fn is None:
                # run-dedup over the survivor stream: ray-major order
                # is preserved by the stable partition above, so coarse
                # levels still see page runs; budgets are runtime-
                # checked with an exact flat fallback (hash_field
                # .query_compacted, VERDICT r4 #5)
                feat = hash_field.query_compacted(
                    params["field"], consts["field"], pts, cfg,
                    point_grads=point_grads,
                    level_weights=level_weights)
            else:
                feat = hash_field.query(params["field"],
                                        consts["field"], pts, cfg,
                                        encode_fn=encode_fn,
                                        point_grads=point_grads,
                                        level_weights=level_weights)
            sigma = density_activation(feat[..., 0], cfg.density_shift)
            shading_feat = jnp.concatenate(
                [jnp.ones_like(feat[..., :1]), feat[..., 1:]], axis=-1)
            if train and emb_idx is not None:
                shading_feat = (shading_feat
                                + params["app_emb"][emb_idx][ray_id])
            dirs = smp.dirs[ray_id]
            colors = sh_shader.query(params["shader"],
                                     shading_feat[:, None, :],
                                     dirs[:, None, :], cfg)[:, 0]
            sec = jnp.where((dt > 0.0) & valid, sigma * dt, 0.0)
            # per-ray exclusive prefix sums in flat ray-major order
            cum = jnp.cumsum(sec)
            per_ray = jax.ops.segment_sum(sec, ray_id, num_segments=r)
            base = jnp.concatenate(
                [jnp.zeros((1,), sec.dtype), jnp.cumsum(per_ray)[:-1]])
            excl = (cum - sec) - base[ray_id]
            trans = jnp.exp(-excl)
            alpha = 1.0 - jnp.exp(-sec)
            w = trans * alpha * valid
            last_trans = jnp.exp(-per_ray)              # [R]
            rgb = (jax.ops.segment_sum(w[:, None] * colors, ray_id,
                                       num_segments=r)
                   + last_trans[:, None] * bg_color)
            depth = (jax.ops.segment_sum(w * (t + 1e-2), ray_id,
                                         num_segments=r)
                     / (1.0 - last_trans + 1e-4))
            # scatter weights/sec back to [R, S] for the ray-shaped
            # losses (unique indices -> deterministic)
            w_full = jnp.zeros((n,), w.dtype).at[idx].set(w)
            sec_full = jnp.zeros((n,), sec.dtype).at[idx].set(sec)
            return RenderResult(
                colors=rgb, depths=depth,
                weights=w_full.reshape(r, s),
                mask=mask1, t=smp.t, dt=smp.dt,
                sec_density=sec_full.reshape(r, s),
                explore=None)
        return branch

    def full_branch(_):
        return _render_samples(params, consts, smp.pts, smp.dirs,
                               smp.t, smp.dt, None, emb_idx, bg_color,
                               cfg, train, encode_fn, point_grads,
                               level_weights)

    buckets = (n // 8, n // 4, n // 2)
    idx = (n_surv > buckets[0]).astype(jnp.int32) \
        + (n_surv > buckets[1]).astype(jnp.int32) \
        + (n_surv > buckets[2]).astype(jnp.int32)
    branches = [compact_branch(b) for b in buckets] + [full_branch]
    return jax.lax.switch(idx, branches, jnp.zeros((), jnp.int32))


import functools


@functools.lru_cache(maxsize=16)
def _jit_validate_render(cfg: ModelConfig, encode_fn, with_occ: bool,
                         with_emb: bool):
    # eval_emb is a traced argument (not a closure constant) so
    # different appearance vectors share one compiled program
    if with_occ and with_emb:
        return jax.jit(
            lambda p, c, o, d, b, e: render(p, c, o, d, None, cfg, None,
                                            train=False,
                                            encode_fn=encode_fn,
                                            occ_bits=b, eval_emb=e)[:2])
    if with_occ:
        return jax.jit(
            lambda p, c, o, d, b: render(p, c, o, d, None, cfg, None,
                                         train=False, encode_fn=encode_fn,
                                         occ_bits=b)[:2])
    if with_emb:
        return jax.jit(
            lambda p, c, o, d, e: render(p, c, o, d, None, cfg, None,
                                         train=False, encode_fn=encode_fn,
                                         eval_emb=e)[:2])
    return jax.jit(
        lambda p, c, o, d: render(p, c, o, d, None, cfg, None, train=False,
                                  encode_fn=encode_fn)[:2])


def render_rays_chunked(params: Params, consts: Params, rays_o: jnp.ndarray,
                        rays_d: jnp.ndarray, cfg: ModelConfig,
                        chunk: int = 8192, encode_fn=None,
                        occ_bits: jnp.ndarray | None = None,
                        mesh=None,
                        eval_emb: jnp.ndarray | None = None
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """VALIDATE-mode render of many rays in fixed-size chunks.

    Reference Renderer::render_all_rays (src/renderer.cpp:125-151). Pads
    the final chunk so every call hits the same compiled shape.

    With ``mesh`` (a ``jax.sharding.Mesh``), each chunk's rays are
    sharded over the mesh's data axis and params/occ_bits replicated, so
    the render runs SPMD across chips (net-new vs the single-GPU
    reference — SURVEY §2.3).
    """
    n = rays_o.shape[0]
    with_occ = cfg.sampler_mode == "occ"
    with_emb = eval_emb is not None
    fn = _jit_validate_render(cfg, encode_fn, with_occ, with_emb)
    if with_emb:
        eval_emb = jnp.asarray(eval_emb)
    ray_sharding = None
    if mesh is not None:
        from f2nerf_tpu.parallel import mesh as mesh_lib
        chunk = -(-chunk // mesh.size) * mesh.size
        ray_sharding = mesh_lib.data_sharding(mesh)
        params = mesh_lib.replicate(mesh, params)
        consts = mesh_lib.replicate(mesh, consts)
        if occ_bits is not None:
            occ_bits = mesh_lib.replicate(mesh, occ_bits)
        if with_emb:
            eval_emb = mesh_lib.replicate(mesh, eval_emb)
    outs_c, outs_d = [], []
    for i in range(0, n, chunk):
        o = rays_o[i:i + chunk]
        d = rays_d[i:i + chunk]
        pad = chunk - o.shape[0]
        if pad:
            o = jnp.pad(o, ((0, pad), (0, 0)), constant_values=1.0)
            d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        if ray_sharding is not None:
            o = jax.device_put(o, ray_sharding)
            d = jax.device_put(d, ray_sharding)
        args = (params, consts, o, d)
        if with_occ:
            args += (occ_bits,)
        if with_emb:
            args += (eval_emb,)
        c, dep = fn(*args)
        outs_c.append(c[:chunk - pad] if pad else c)
        outs_d.append(dep[:chunk - pad] if pad else dep)
    return jnp.concatenate(outs_c, 0), jnp.concatenate(outs_d, 0)


def render_image(params: Params, consts: Params, pose: jnp.ndarray,
                 intrinsic: jnp.ndarray,
                 h: int, w: int, cfg: ModelConfig, chunk: int = 8192,
                 encode_fn=None, occ_bits: jnp.ndarray | None = None,
                 mesh=None, eval_emb: jnp.ndarray | None = None,
                 supersample: int = 1
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render a full image; returns (rgb [H, W, 3] clipped, depth [H, W]).

    Reference Renderer::render_image (src/renderer.cpp:153-172); with
    ``mesh``, rays are sharded across chips (see render_rays_chunked).

    ``supersample=k`` renders at k*h x k*w through scaled intrinsics
    and box-averages k x k blocks — the ray through supersampled pixel
    (k*i + a, k*j + b) has image-plane coordinate
    ((k*j + b + .5) - k*cx) / (k*fx), whose k x k average equals the
    original pixel-center ray, so this is exact area supersampling of
    the original camera (net-new eval aid; the reference renders one
    center ray per pixel).
    """
    from f2nerf_tpu.core.cameras import pixel_grid, rays_from_pose
    k = max(int(supersample), 1)
    if k > 1:
        intrinsic = jnp.asarray(intrinsic) * k
        intrinsic = intrinsic.at[2, 2].set(1.0)
    hh, ww = h * k, w * k
    ij = jnp.asarray(pixel_grid(hh, ww))
    rays_o, rays_d = rays_from_pose(pose[None], intrinsic[None], ij)
    colors, depths = render_rays_chunked(
        params, consts, rays_o, rays_d, cfg, chunk=chunk,
        encode_fn=encode_fn, occ_bits=occ_bits, mesh=mesh,
        eval_emb=eval_emb)
    rgb = jnp.clip(colors.reshape(hh, ww, 3), 0.0, 1.0)
    depth = depths.reshape(hh, ww)
    if k > 1:
        rgb = rgb.reshape(h, k, w, k, 3).mean(axis=(1, 3))
        depth = depth.reshape(h, k, w, k).mean(axis=(1, 3))
    return rgb, depth
