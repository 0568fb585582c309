"""LPIPS(vgg) perceptual metric — self-contained torch (CPU) port.

The reference's eval harness runs the ``lpips`` pip package with
network-downloaded VGG16 + linear-calibration weights
(``/root/reference/scripts/eval.py:78-117``). This environment has no
egress and no ``lpips``/``torchvision`` packages, so the metric is
implemented here directly (Zhang et al. 2018 architecture: VGG16
feature slices -> per-channel unit normalization -> squared diff ->
learned 1x1 linear calibration -> spatial mean -> layer sum) and the
weights are loaded from an explicit local file.

Weight file format (``torch.save``-d dict):

* ``"features"``: state_dict of the 13-conv VGG16 feature stack
  produced by :func:`build_vgg16_features` (keys ``<idx>.weight`` /
  ``<idx>.bias`` following the torchvision ``vgg16().features``
  layout), and
* ``"lin"``: list of 5 tensors ``[1, C_l, 1, 1]`` — the LPIPS linear
  heads for the slices (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).

``scripts/export_lpips_weights.py`` builds this file on any machine
that has torchvision + lpips installed; point ``LPIPS_WEIGHTS`` (env)
or ``--lpips_weights`` (scripts/eval.py) at it here.
"""

from __future__ import annotations

import os
import pathlib

# VGG16 conv layout (torchvision vgg16().features indices):
# conv indices 0,2, 5,7, 10,12,14, 17,19,21, 24,26,28; 'M' = maxpool.
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# slice boundaries AFTER the relu of the last conv in each block
SLICE_ENDS = (4, 9, 16, 23, 30)
LIN_CHANNELS = (64, 128, 256, 512, 512)

# input normalization used by LPIPS (expects inputs in [-1, 1])
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def build_vgg16_features():
    """The 13-conv VGG16 feature stack as an nn.Sequential whose
    state_dict keys match torchvision's ``vgg16().features``."""
    import torch.nn as nn

    layers = []
    in_ch = 3
    for v in VGG16_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers[:SLICE_ENDS[-1]])


class LPIPSVgg:
    """Callable LPIPS(vgg) distance. Construct via :func:`load`."""

    def __init__(self, state: dict):
        import torch

        self._torch = torch
        self.features = build_vgg16_features()
        self.features.load_state_dict(state["features"])
        self.features.eval()
        for p in self.features.parameters():
            p.requires_grad_(False)
        lin = [torch.as_tensor(w, dtype=torch.float32)
               for w in state["lin"]]
        assert len(lin) == len(LIN_CHANNELS), "need 5 linear heads"
        for w, c in zip(lin, LIN_CHANNELS):
            assert tuple(w.shape) == (1, c, 1, 1), (
                f"lin head shape {tuple(w.shape)} != (1, {c}, 1, 1)")
        self.lin = lin
        self._shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        self._scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def _slices(self, x):
        outs = []
        prev = 0
        for end in SLICE_ENDS:
            for i in range(prev, end):
                x = self.features[i](x)
            outs.append(x)
            prev = end
        return outs

    @staticmethod
    def _unit_normalize(t, eps=1e-10):
        norm = (t ** 2).sum(dim=1, keepdim=True).sqrt()
        return t / (norm + eps)

    def __call__(self, x, y) -> float:
        """x, y: [B, 3, H, W] torch tensors in [-1, 1] -> mean LPIPS."""
        torch = self._torch
        with torch.no_grad():
            x = (x - self._shift) / self._scale
            y = (y - self._shift) / self._scale
            fx, fy = self._slices(x), self._slices(y)
            total = 0.0
            for a, b, w in zip(fx, fy, self.lin):
                d = (self._unit_normalize(a)
                     - self._unit_normalize(b)) ** 2
                # linear head = non-negative per-channel weights (the
                # lpips package clamps them >= 0 at inference)
                d = (d * w.clamp(min=0)).sum(dim=1, keepdim=True)
                total = total + d.mean(dim=(2, 3))
            return float(total.mean())


def default_weights_path() -> pathlib.Path | None:
    env = os.environ.get("LPIPS_WEIGHTS")
    if env:
        return pathlib.Path(env)
    here = pathlib.Path(__file__).resolve().parents[2]
    cand = here / "weights" / "lpips_vgg.pt"
    return cand if cand.exists() else None


def load(path: str | os.PathLike | None = None) -> LPIPSVgg | None:
    """Load LPIPS weights; None (with no exception) when unavailable."""
    try:
        import torch
    except ImportError:
        return None
    p = pathlib.Path(path) if path is not None else default_weights_path()
    if p is None or not p.exists():
        return None
    state = torch.load(p, map_location="cpu", weights_only=False)
    return LPIPSVgg(state)


def make_random_weights(path: str | os.PathLike, seed: int = 0) -> None:
    """Write a structurally-valid weight file with random values —
    for tests that must prove the loader + forward path runs end to
    end without the real (network-gated) VGG weights."""
    import torch

    torch.manual_seed(seed)
    feats = build_vgg16_features()
    state = {"features": feats.state_dict(),
             "lin": [torch.rand(1, c, 1, 1) * 0.1
                     for c in LIN_CHANNELS]}
    torch.save(state, path)
