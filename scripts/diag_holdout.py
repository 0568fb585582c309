#!/usr/bin/env python
"""Holdout-failure discriminator (round 4).

Renders a held-out view from a quality_run checkpoint three ways:
  (a) normal render;
  (b) directions frozen to a constant vector in the SH shader input
      (geometry unchanged) — if (b) >> (a), the failure lives in
      view-dependent shading, not geometry;
  (c) depth maps for one train + one holdout view (multi-sheet
      geometry shows as noisy depth at the holdout pose).
Writes PNGs + prints PSNRs.
"""
from __future__ import annotations
import argparse, dataclasses, pathlib, sys
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("result_dir", type=pathlib.Path)
    ap.add_argument("--scene", default="checker")
    ap.add_argument("--n_images", type=int, default=32)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--holdout_every", type=int, default=8)
    ap.add_argument("--holdout_view", type=int, default=8)
    ap.add_argument("--train_view", type=int, default=7)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_compilation_cache")
    import jax.numpy as jnp
    from f2nerf_tpu.core.config import Config
    from f2nerf_tpu.core.cameras import pixel_grid, rays_from_pose
    from f2nerf_tpu.data.synthetic import (make_checker_dataset,
                                           make_corridor_dataset,
                                           make_sphere_dataset,
                                           make_textured_dataset)
    from f2nerf_tpu.models import occupancy, renderer, hash_field, sh_shader
    from f2nerf_tpu.ops.composite import composite, density_activation
    from f2nerf_tpu.train.loop import Trainer
    from f2nerf_tpu.utils.metrics import psnr
    from f2nerf_tpu.utils.image_io import write_image

    make = {"checker": make_checker_dataset, "sphere": make_sphere_dataset,
            "corridor": make_corridor_dataset,
            "textured": make_textured_dataset}[args.scene]
    ds = make(n_images=args.n_images, h=args.hw, w=args.hw)
    cfg = Config.load(args.result_dir / "train_config.yaml")
    # rebuild the same holdout split the run trained with (app_emb is
    # sized to the TRAIN view count)
    held = list(range(0, ds.n_images, args.holdout_every))
    keep = [i for i in range(ds.n_images) if i not in held]
    train_ds = dataclasses.replace(
        ds, poses=ds.poses[keep], intrinsics=ds.intrinsics[keep],
        dist_params=ds.dist_params[keep], bounds=ds.bounds[keep],
        images=ds.images[keep])
    tr = Trainer(cfg, train_ds, result_dir=args.result_dir / "diag_tmp")
    # restore from the run's checkpoints
    from f2nerf_tpu.train import checkpoint as ckpt_lib
    state = ckpt_lib.restore(
        args.result_dir / "checkpoints",
        {"params": tr.params, "opt_state": tr.opt_state,
         "consts": tr.consts, "step": 0,
         "extra": {"occ_grid": tr.occ_grid}})
    params, consts = state["params"], state["consts"]
    occ_grid = state["extra"]["occ_grid"]
    occ_bits = (occupancy.occ_values(occ_grid, cfg.model)
                if cfg.model.sampler_mode == "occ" else None)
    print("restored step", state["step"])

    out = args.result_dir
    cfgm = cfg.model

    def render_view(i, fixed_dir=None, tag=""):
        ij = jnp.asarray(pixel_grid(args.hw, args.hw))
        rays_o, rays_d = rays_from_pose(
            jnp.asarray(ds.poses[i])[None],
            jnp.asarray(ds.intrinsics[i])[None], ij)

        @jax.jit
        def rend(params, consts, rays_o, rays_d, occ_bits):
            if cfgm.sampler_mode == "occ":
                smp = occupancy.sample_rays_occ(rays_o, rays_d, occ_bits,
                                                cfgm, None)
            else:
                from f2nerf_tpu.models import sampler as dsm
                smp = dsm.sample_rays(rays_o, rays_d, cfgm, None)
            feat = hash_field.query_rays(params["field"], consts["field"],
                                         smp.pts, cfgm)
            sigma = density_activation(feat[..., 0], cfgm.density_shift)
            shading = jnp.concatenate(
                [jnp.ones_like(feat[..., :1]), feat[..., 1:]], axis=-1)
            r, s = smp.pts.shape[0], smp.pts.shape[1]
            d = smp.dirs
            if fixed_dir is not None:
                d = jnp.broadcast_to(jnp.asarray(fixed_dir), d.shape)
            dirs = jnp.broadcast_to(d[:, None, :], (r, s, 3))
            colors = sh_shader.query(params["shader"], shading, dirs, cfgm)
            sec = jnp.where(smp.dt > 0.0, sigma * smp.dt, 0.0)
            bg = jnp.full((r, 3), 0.5)
            rgb, depth, w, m = composite(sec, colors, smp.t, bg, cfgm.trans_eps)
            return rgb, depth
        rgbs, deps = [], []
        n = args.hw * args.hw
        for c0 in range(0, n, 16384):
            c1 = min(c0 + 16384, n)
            o, dd = rays_o[c0:c1], rays_d[c0:c1]
            pad = 16384 - (c1 - c0)
            if pad:
                o = jnp.pad(o, ((0, pad), (0, 0)))
                dd = jnp.pad(dd, ((0, pad), (0, 0)), constant_values=1.0)
            rgb, dep = rend(params, consts, o, dd, occ_bits)
            rgbs.append(np.asarray(rgb)[:c1 - c0])
            deps.append(np.asarray(dep)[:c1 - c0])
        rgb = np.clip(np.concatenate(rgbs).reshape(args.hw, args.hw, 3), 0, 1)
        dep = np.concatenate(deps).reshape(args.hw, args.hw)
        p = psnr(rgb, ds.images[i])
        print(f"view {i} {tag}: psnr {p:.2f} depth[p10,p50,p90]="
              f"{np.percentile(dep, [10, 50, 90]).round(3).tolist()}")
        write_image(out / f"diag_{tag}_{i}.png", rgb)
        dn = (dep - dep.min()) / max(dep.max() - dep.min(), 1e-6)
        write_image(out / f"diag_{tag}_{i}_depth.png",
                    np.repeat(dn[..., None], 3, -1))
        return p

    hv, tv = args.holdout_view, args.train_view
    # fixed dir: the train view's central axis (-z of its pose)
    fdir = -np.asarray(ds.poses[tv][:3, 2])
    render_view(tv, tag="train")
    render_view(hv, tag="holdout")
    render_view(hv, fixed_dir=fdir, tag="holdout_fixdir")
    render_view(tv, fixed_dir=fdir, tag="train_fixdir")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
