import sys, dataclasses, json, numpy as np, jax
from f2nerf_tpu.core.config import Config, ModelConfig, TrainConfig
from f2nerf_tpu.data.synthetic import make_sphere_dataset
from f2nerf_tpu.train.loop import Trainer
from f2nerf_tpu.models import renderer
from f2nerf_tpu.models.occupancy import sigma_threshold
from f2nerf_tpu.utils.metrics import psnr

mode, steps, rd = sys.argv[1], int(sys.argv[2]), sys.argv[3]
ds = make_sphere_dataset(n_images=12, h=96, w=96)
model = ModelConfig(sampler_mode=mode)
train = TrainConfig(end_iter=2000, report_freq=500, vis_freq=10**9, save_freq=10**9)
cfg = Config(model=model, train=train)
tr = Trainer(cfg, ds, result_dir=rd)
if tr.try_resume():
    print('resumed at', tr.step)
m = tr.run(min(steps, cfg.train.end_iter - tr.step))
tr.save_checkpoint()
if tr.step >= cfg.train.end_iter:
    ps = []
    for vi in [0, 5]:
        rgb, _ = renderer.render_image(tr.params, tr.consts, tr.poses[vi], tr.intrinsics[vi],
                                       96, 96, cfg.model, chunk=9216, occ_bits=tr.occ_bits())
        ps.append(psnr(np.asarray(rgb), ds.images[vi]))
    occ_frac = float((np.asarray(tr.occ_grid) >= sigma_threshold(cfg.model)).mean())
    print('FINAL', mode, json.dumps({"train_psnr": m["psnr"], "render_psnr": ps, "occ_frac": occ_frac}))
