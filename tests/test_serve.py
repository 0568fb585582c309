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


def test_localize_auto_resizes_image(server):
    """The reference node resizes incoming frames to the localizer
    resolution before use (nerf_based_localizer.cpp:225-235)."""
    srv, ds, core = server
    addr = srv.server_address
    pose_world = core.camera2world(ds.poses[1])
    assert _rpc(addr, {"cmd": "init_pose", "pose": pose_world.tolist()})["ok"]

    from f2nerf_tpu.utils.image_io import resize_image
    big = resize_image(np.asarray(ds.images[1]), 40, 40)
    r = _rpc(addr, {"cmd": "localize", "image": big.tolist(), "mode": 1})
    assert r["ok"]
    assert np.asarray(r["pose"]).shape == (4, 4)


def test_replay_dataset_script(server, tmp_path, monkeypatch):
    """scripts/replay_dataset.py drives the service in lock-step like the
    reference's pose_and_image_publisher node, writing replay_log.tsv."""
    import pathlib
    import sys

    srv, ds, core = server
    scripts = pathlib.Path(__file__).parent.parent / "scripts"
    monkeypatch.syspath_prepend(str(scripts))
    import replay_dataset

    from f2nerf_tpu.utils.image_io import write_image
    ddir = tmp_path / "replay_ds"
    (ddir / "images").mkdir(parents=True)
    cams = np.zeros((2, 27), np.float32)
    for i in range(2):
        write_image(ddir / "images" / f"{i:04d}.png", np.asarray(ds.images[i]))
        cams[i, :12] = core.camera2world(ds.poses[i])[:3, :4].ravel()
    np.save(ddir / "cams_meta.npy", cams)

    host, port = srv.server_address
    monkeypatch.setattr(sys, "argv", [
        "replay_dataset.py", str(ddir), "--host", str(host),
        "--port", str(port), "--mode", "1"])
    replay_dataset.main()

    lines = (ddir / "replay_log.tsv").read_text().splitlines()
    assert len(lines) == 3  # header + 2 frames
    assert lines[0].split("\t")[:3] == ["frame", "score", "noise_coeff"]


def test_localize_staged_mode(server):
    """mode 2: the staged pipeline (Localizer.localize) over the wire,
    reporting the auto-lr diagnostics."""
    srv, ds, core = server
    addr = srv.server_address
    pose_w = core.camera2world(np.asarray(ds.poses[1]))
    r = _rpc(addr, {"cmd": "init_pose", "pose": pose_w.tolist()})
    assert r["ok"]
    r = _rpc(addr, {"cmd": "localize", "mode": 2,
                    "image": ds.images[1].tolist(),
                    "particle_num": 16, "search_rounds": 1,
                    "diff_iters": 3, "diff_lr": 1e-3})
    assert r["ok"]
    assert np.isfinite(r["score"])
    assert "diff_loss" in r and "lr_final" in r and "backtracks" in r
    assert np.asarray(r["pose"]).shape == (4, 4)
