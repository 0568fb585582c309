"""CLI end-to-end tests: train -> test -> infer -> render on a tiny
synthetic dataset (reference main.cpp command semantics)."""

import dataclasses
import pathlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess/multi-process drivers (pytest.ini)

from f2nerf_tpu.apps import main as cli
from f2nerf_tpu.core.config import Config, ModelConfig, TrainConfig
from f2nerf_tpu.data.dataset import save_dataset
from f2nerf_tpu.data.synthetic import make_sphere_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    ds_dir = root / "dataset"
    rd = root / "run"
    rd.mkdir()
    ds = make_sphere_dataset(n_images=4, h=24, w=24)
    save_dataset(ds, ds_dir)
    cfg = Config(
        model=ModelConfig(n_levels=2, n_channels=2, log2_table_size=11,
                          n_samples=24, sample_l=1.0 / 6.0,
                          bf16_features=False, sampler_mode="dense"),
        train=TrainConfig(pts_batch_size=16384, end_iter=40,
                          report_freq=20, vis_freq=10 ** 9,
                          save_freq=40,
                          learning_rate_warm_up_end_iter=10,
                          var_loss_start=10, var_loss_end=20))
    cfg.save(rd / "train_config.yaml")
    return rd, ds_dir, ds


def test_train_and_resume(workspace):
    rd, ds_dir, _ = workspace
    cli.main(["train", str(rd), str(ds_dir)])
    assert (rd / "train_log.txt").exists()
    assert (rd / "inference_params.yaml").exists()
    assert list((rd / "checkpoints").glob("step_*"))
    # resume is a no-op when already at end_iter but must not crash
    cli.main(["train", str(rd), str(ds_dir)])


def test_test_command(workspace):
    rd, ds_dir, ds = workspace
    cli.main(["test", str(rd), str(ds_dir)])
    summary = (rd / "test_result" / "summary.tsv").read_text().splitlines()
    assert summary[0] == "average_time\taverage_score"
    t, s = [float(v) for v in summary[1].split("\t")]
    assert t > 0 and s > 0
    pngs = list((rd / "test_result").glob("*.png"))
    assert len(pngs) == ds.n_images


def test_render_command(workspace, tmp_path):
    rd, ds_dir, ds = workspace
    poses = np.stack([ds.poses[0], ds.poses[1]])
    np.save(tmp_path / "poses.npy", poses)
    out = tmp_path / "renders"
    cli.main(["render", str(rd), str(tmp_path / "poses.npy"), str(out)])
    assert len(list(out.glob("*.png"))) == 2


def test_infer_command(workspace, monkeypatch):
    rd, ds_dir, ds = workspace
    # resize_factor 32 would degenerate 24px images; patch to 2
    from f2nerf_tpu.localize.localizer import Localizer, LocalizerParam
    orig = Localizer.from_checkpoint.__func__

    def patched(cls, d, param=None):
        return orig(cls, d, LocalizerParam(resize_factor=2))

    monkeypatch.setattr(Localizer, "from_checkpoint",
                        classmethod(patched))
    # trim dataset to 1 image for speed
    import f2nerf_tpu.apps.main as m

    real_load = m.__dict__.get("load_dataset")  # not imported at module level
    from f2nerf_tpu.data import dataset as dsmod
    orig_load = dsmod.load_dataset

    def load_one(d):
        full = orig_load(d)
        return dataclasses.replace(
            full, poses=full.poses[:1], intrinsics=full.intrinsics[:1],
            dist_params=full.dist_params[:1], bounds=full.bounds[:1],
            images=full.images[:1])

    monkeypatch.setattr(dsmod, "load_dataset", load_one)
    cli.main(["infer", str(rd), str(ds_dir)])
    pos = rd / "inference_result" / "0000" / "position.tsv"
    assert pos.exists()
    lines = pos.read_text().splitlines()
    assert lines[0] == "name\tx\ty\tz\tscore"
    names = [ln.split("\t")[0] for ln in lines[1:]]
    assert "original" in names and "noised_0" in names
    assert any(n.startswith("optimized_0_") for n in names)
