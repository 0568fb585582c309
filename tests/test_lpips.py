"""LPIPS loader/forward tests with tiny random "VGG" weights.

VERDICT r2 missing #4: real VGG weights are network-gated and absent
from this environment, but the loader and forward path must be
exercised so eval.py's "weights absent" marker means exactly that —
not "code never ran". Reference metric: scripts/eval.py:78-117 (LPIPS
vgg over gt/pred dirs)."""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts"


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    from f2nerf_tpu.utils import lpips as lp
    p = tmp_path_factory.mktemp("lpips") / "lpips_vgg.pt"
    lp.make_random_weights(p, seed=0)
    return p


def test_load_and_forward(weights):
    from f2nerf_tpu.utils import lpips as lp

    model = lp.load(weights)
    assert model is not None
    g = torch.Generator().manual_seed(1)
    x = torch.rand(1, 3, 32, 32, generator=g) * 2 - 1
    y = torch.rand(1, 3, 32, 32, generator=g) * 2 - 1
    d_xy = model(x, y)
    assert np.isfinite(d_xy) and d_xy > 0
    # identical inputs -> exactly zero distance
    assert model(x, x) == 0.0
    # symmetric
    assert model(y, x) == pytest.approx(d_xy, rel=1e-5)


def test_load_missing_returns_none(tmp_path):
    from f2nerf_tpu.utils import lpips as lp
    assert lp.load(tmp_path / "nope.pt") is None


def test_eval_script_produces_lpips_number(weights, tmp_path):
    """eval.py end-to-end: with LPIPS_WEIGHTS set, info.json carries a
    real lpips_vgg number (the reference's eval.py contract)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    gt_dir, pred_dir = tmp_path / "gt", tmp_path / "pred"
    gt_dir.mkdir(), pred_dir.mkdir()
    for i in range(2):
        a = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        noise = rng.integers(-20, 20, a.shape)
        b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
        Image.fromarray(a).save(gt_dir / f"{i}.png")
        Image.fromarray(b).save(pred_dir / f"{i}.png")

    r = subprocess.run(
        [sys.executable, str(SCRIPTS / "eval.py"),
         "--gt_dir", str(gt_dir), "--pred_dir", str(pred_dir)],
        capture_output=True, text=True,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "LPIPS_WEIGHTS": str(weights)})
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads((pred_dir / "info.json").read_text())
    assert info["lpips_vgg"] is not None
    assert np.isfinite(info["lpips_vgg"]) and info["lpips_vgg"] > 0
