#!/usr/bin/env python
"""Compare PSNR curves between train_log.txt files.

Reference ``scripts/compare_train_result.py``: parses the
``Time .. Iter .. PSNR .. LOSS .. LR`` lines our Trainer writes in the
same format, prints a table and optionally saves a plot.
"""

from __future__ import annotations

import argparse
import pathlib
import re

import numpy as np

LINE_RE = re.compile(
    r"Time:\s*(\S+)\s*Iter:\s*(\d+)\s*PSNR:\s*([\d.+-einf]+)"
    r"\s*LOSS:\s*([\d.+-e]+)\s*LR:\s*([\d.+-e]+)")


def parse_log(path: str | pathlib.Path):
    iters, psnrs, losses = [], [], []
    for line in pathlib.Path(path).read_text().splitlines():
        m = LINE_RE.search(line)
        if m:
            iters.append(int(m.group(2)))
            psnrs.append(float(m.group(3)))
            losses.append(float(m.group(4)))
    return np.array(iters), np.array(psnrs), np.array(losses)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+", help="train_log.txt paths")
    ap.add_argument("--plot", default=None, help="output png path")
    args = ap.parse_args()

    curves = []
    for p in args.logs:
        it, ps, lo = parse_log(p)
        curves.append((p, it, ps, lo))
        if len(it):
            print(f"{p}: final iter {it[-1]}, PSNR {ps[-1]:.3f}, "
                  f"best {ps.max():.3f}")
        else:
            print(f"{p}: no parsable lines")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 5))
        for p, it, ps, _ in curves:
            ax.plot(it, ps, label=pathlib.Path(p).parent.name)
        ax.set_xlabel("iteration")
        ax.set_ylabel("PSNR (EMA)")
        ax.legend()
        ax.grid(True, alpha=0.3)
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
