#!/usr/bin/env python
"""Build the local LPIPS(vgg) weight file used by scripts/eval.py.

Run this ONCE on any machine with network access and the ``lpips`` +
``torchvision`` packages installed; copy the output file to the
offline machine and point ``LPIPS_WEIGHTS`` (or ``--lpips_weights``)
at it. Format documented in f2nerf_tpu/utils/lpips.py.

    python scripts/export_lpips_weights.py weights/lpips_vgg.pt
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                       else "weights/lpips_vgg.pt")
    out.parent.mkdir(parents=True, exist_ok=True)

    import lpips  # type: ignore
    import torch
    import torchvision  # type: ignore

    from f2nerf_tpu.utils.lpips import LIN_CHANNELS, SLICE_ENDS

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    feat_state = {k: v for k, v in vgg.state_dict().items()
                  if int(k.split(".")[0]) < SLICE_ENDS[-1]}

    model = lpips.LPIPS(net="vgg")
    lin = [m.model[-1].weight.detach().clone() for m in model.lins]
    assert [w.shape[1] for w in lin] == list(LIN_CHANNELS)

    torch.save({"features": feat_state, "lin": lin}, out)
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
