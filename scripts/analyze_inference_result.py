#!/usr/bin/env python
"""Analyze `infer` output: pose-recovery error statistics.

Reference ``scripts/analyze_inference_result.py``: reads the
``position.tsv`` files written per image by the infer command
(apps/main.py cmd_infer), reporting how far the optimized poses moved
back toward the original from each perturbation direction.
"""

from __future__ import annotations

import argparse
import glob
import pathlib

import numpy as np


def analyze(result_dir: str) -> dict:
    dirs = sorted(glob.glob(str(pathlib.Path(result_dir) / "[0-9]*")))
    recoveries, final_errors, init_errors = [], [], []
    for d in dirs:
        tsv = pathlib.Path(d) / "position.tsv"
        if not tsv.exists():
            continue
        rows = {}
        for line in tsv.read_text().splitlines()[1:]:
            tok = line.split("\t")
            rows[tok[0]] = np.array([float(v) for v in tok[1:4]])
        if "original" not in rows:
            continue
        orig = rows["original"]
        for dnum in range(8):
            noised = rows.get(f"noised_{dnum}")
            if noised is None:
                continue
            opts = sorted(k for k in rows
                          if k.startswith(f"optimized_{dnum}_"))
            if not opts:
                continue
            final = rows[opts[-1]]
            e0 = np.linalg.norm(noised - orig)
            e1 = np.linalg.norm(final - orig)
            init_errors.append(e0)
            final_errors.append(e1)
            recoveries.append(1.0 - e1 / max(e0, 1e-9))
    out = {
        "n_cases": len(recoveries),
        "mean_init_error": float(np.mean(init_errors)) if recoveries else 0,
        "mean_final_error": float(np.mean(final_errors)) if recoveries else 0,
        "mean_recovery": float(np.mean(recoveries)) if recoveries else 0,
        "recovered_fraction": float(np.mean(
            np.array(final_errors) < np.array(init_errors)))
        if recoveries else 0,
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("result_dir",
                    help="<train_result_dir>/inference_result")
    args = ap.parse_args()
    out = analyze(args.result_dir)
    for k, v in out.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
