#!/usr/bin/env python3
"""Localizer latency bench (reference metric: per-callback localize ms,
ros2/src/ros2-f2-nerf/src/nerf_based_localizer.cpp:401 and infer's
pose-optimize timing, src/main_functions/infer.cpp:98-101).

Times the three localize primitives on the current backend with the
flagship model (random weights — latency is shape-bound):
particle search (100 particles x render_pixel_num px, one batched
render), one differential pose-optimization step (grad through the
renderer), and a full-frame render at localize resolution.

Usage: python scripts/bench_localize.py [--resize 8]
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resize", type=int, default=8,
                    help="resize_factor (reference infer uses 32; the "
                         "ROS node 1)")
    ap.add_argument("--particles", type=int, default=100)
    args = ap.parse_args()

    from f2nerf_tpu.core.config import Config
    from f2nerf_tpu.models import renderer, occupancy
    from f2nerf_tpu.localize.localizer import Localizer, LocalizerParam

    cfg = Config()
    key = jax.random.key(0)
    params, consts = renderer.init(key, cfg.model, 4)
    occ_vals = occupancy.occ_values(
        occupancy.init_grid(cfg.model), cfg.model)
    h, w = 850, 1920        # the ROS node's cropped camera frame
    intr = np.array([[1000.0, 0, w / 2], [0, 1000.0, h / 2],
                     [0, 0, 1.0]], np.float32)
    param = LocalizerParam(resize_factor=args.resize)
    loc = Localizer(params, consts, cfg, intr, np.zeros(3), 1.0, h, w,
                    param=param, occ_bits=occ_vals, seed=0)
    pose = np.eye(3, 4, dtype=np.float32)
    img = np.asarray(loc.render_image(pose))

    def timeit(fn, n=5):
        fn()                      # compile/warmup
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n * 1000

    t_search = timeit(lambda: loc.optimize_pose_by_random_search(
        pose, img, particle_num=args.particles, noise_coeff=1.0))
    t_diff = timeit(lambda: loc.optimize_pose_by_differential(
        pose, img, iteration_num=1))
    t_render = timeit(lambda: np.asarray(loc.render_image(pose)))
    print(f"particle search ({args.particles} particles x "
          f"{param.render_pixel_num} px): {t_search:.1f} ms")
    print(f"differential opt (1 iter, {loc.infer_height}x"
          f"{loc.infer_width}): {t_diff:.1f} ms")
    print(f"full render {loc.infer_height}x{loc.infer_width}: "
          f"{t_render:.1f} ms")


if __name__ == "__main__":
    main()
