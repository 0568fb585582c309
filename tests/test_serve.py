"""Localizer service tests: JSON-over-TCP protocol end-to-end."""

import json
import socket
import threading

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import jax

    from f2nerf_tpu.apps.serve import serve
    from f2nerf_tpu.core.config import Config, ModelConfig, TrainConfig
    from f2nerf_tpu.data.synthetic import make_sphere_dataset
    from f2nerf_tpu.localize.localizer import Localizer, LocalizerParam
    from f2nerf_tpu.train.loop import Trainer

    cfg = Config(
        model=ModelConfig(n_levels=2, n_channels=2, log2_table_size=11,
                          n_samples=24, sample_l=1.0 / 6.0,
                          bf16_features=False, sampler_mode="dense"),
        train=TrainConfig(pts_batch_size=16384, end_iter=60,
                          report_freq=30, vis_freq=10 ** 9,
                          save_freq=10 ** 9,
                          learning_rate_warm_up_end_iter=10,
                          var_loss_start=20, var_loss_end=40))
    ds = make_sphere_dataset(n_images=4, h=20, w=20)
    rd = tmp_path_factory.mktemp("srv_run")
    tr = Trainer(cfg, ds, result_dir=rd)
    tr.run()
    tr.save_checkpoint()
    core = Localizer.from_checkpoint(rd, LocalizerParam(resize_factor=1))
    core._rng = np.random.default_rng(0)
    srv = serve(core, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, ds, core
    srv.shutdown()


def _rpc(addr, req):
    with socket.create_connection(addr, timeout=120) as s:
        f = s.makefile("rw")
        f.write(json.dumps(req) + "\n")
        f.flush()
        return json.loads(f.readline())


def test_protocol(server):
    srv, ds, core = server
    addr = srv.server_address

    # status before init
    st = _rpc(addr, {"cmd": "status"})
    assert st["ok"] and not st["initialized"]

    # localize before init errors cleanly
    r = _rpc(addr, {"cmd": "localize",
                    "image": ds.images[0].tolist()})
    assert not r["ok"]

    # init with the world-frame pose corresponding to dataset pose 0
    pose_world = core.camera2world(ds.poses[0])
    r = _rpc(addr, {"cmd": "init_pose", "pose": pose_world.tolist()})
    assert r["ok"]

    # particle localization
    r = _rpc(addr, {"cmd": "localize", "image": ds.images[0].tolist(),
                    "mode": 0, "particle_num": 16})
    assert r["ok"]
    assert np.asarray(r["pose"]).shape == (4, 4)
    assert r["score"] > 0
    assert 1.0 <= r["noise_coeff"] <= 5.0

    # differential mode
    r2 = _rpc(addr, {"cmd": "localize", "image": ds.images[0].tolist(),
                     "mode": 1})
    assert r2["ok"]

    st = _rpc(addr, {"cmd": "status"})
    assert st["frames"] == 2 and st["initialized"]

    # bad command errors, connection survives
    bad = _rpc(addr, {"cmd": "nope"})
    assert not bad["ok"]
