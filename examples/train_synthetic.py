#!/usr/bin/env python
"""Example: end-to-end training + evaluation on the synthetic scene.

Runs anywhere (CPU or TPU): trains the sphere dataset with the
occupancy sampler, renders a held-out view, reports PSNR, and exercises
checkpoint resume. Used by the verify recipe and as living
documentation of the API.
"""
import dataclasses
import pathlib
import sys

import numpy as np

from f2nerf_tpu.core.config import Config, ModelConfig, TrainConfig
from f2nerf_tpu.data.synthetic import make_sphere_dataset
from f2nerf_tpu.models import renderer
from f2nerf_tpu.train.loop import Trainer
from f2nerf_tpu.utils.metrics import psnr


def main(result_dir: str = "/tmp/f2nerf_example", steps: int = 600):
    ds = make_sphere_dataset(n_images=10, h=64, w=64)
    cfg = Config(
        model=ModelConfig(n_levels=8, log2_table_size=16,
                          sampler_mode="occ", occ_warmup_steps=128),
        train=TrainConfig(end_iter=steps, report_freq=100,
                          vis_freq=max(steps // 2, 1), save_freq=steps,
                          learning_rate_warm_up_end_iter=50,
                          var_loss_start=150, var_loss_end=300))
    tr = Trainer(cfg, ds, result_dir=pathlib.Path(result_dir))
    if tr.try_resume():
        print(f"resumed from step {tr.step}")
    tr.run()
    tr.save_checkpoint()

    rgb, depth = renderer.render_image(
        tr.params, tr.consts, tr.poses[0], tr.intrinsics[0],
        ds.height, ds.width, cfg.model, chunk=4096,
        occ_bits=tr.occ_bits())
    p = psnr(np.asarray(rgb), ds.images[0])
    print(f"render PSNR vs view 0: {p:.2f} dB")
    return p


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/f2nerf_example"]),
         *(int(a) for a in sys.argv[2:3]))
