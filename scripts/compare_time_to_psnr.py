#!/usr/bin/env python
"""Quality-normalized throughput comparison between two training runs.

VERDICT round-1 #2: raw rays/s is not comparable across samplers (the
occ sampler does 1/16 the samples/ray of the reference's dense march),
so the honest metric is *time-to-PSNR*: wall-clock to reach a target
train-PSNR (EMA, train_log.txt) plus the end-state render PSNR
(summary.tsv). Reference semantics for the log format:
src/main_functions/train_manager.cpp:138-153; for the render score:
src/main_functions/test.cpp:38-41.

Wall-clock is reconstructed as step x median-tranche step time; the
median excludes per-window compile tranches (this harness trains in
resumable slices over a remote TPU tunnel, scripts/quality_run.py) and
checkpoint saves — i.e. it is the steady-state on-device rate, which is
what a locally attached chip sustains.

Usage:
  python scripts/compare_time_to_psnr.py _runs/r2_q20k_wd _runs/r2_dense20k \
      --labels occ-flagship dense-reference --targets 28 30 32 33
"""

from __future__ import annotations

import argparse
import pathlib
import re

import numpy as np

LINE = re.compile(
    r"Time: (\d+):(\d+) Iter:\s*(\d+) PSNR: ([\d.]+) LOSS: ([\d.]+)")


def parse_run(d: pathlib.Path):
    """Parse train_log.txt into (steps, psnrs, median ms/step).

    The log's "Time:" column is CUMULATIVE within one process (Trainer
    accumulates across run() chunks), so per-tranche durations are
    deltas between consecutive report lines. A clock regression marks a
    process/window boundary (run_until_done-style resumed runs): the
    clock restarts at 0 there, so the boundary line's delta is taken
    from 0 (ADVICE r2: the previous revision read each line's time as a
    per-tranche duration, inflating CLI-trainer per-step times).
    """
    steps, psnrs, tranche_s = [], [], []
    prev_step = prev_t = None
    for ln in (d / "train_log.txt").read_text().splitlines():
        m = LINE.match(ln)
        if not m:
            continue
        mm, ss, it, ps = int(m[1]), int(m[2]), int(m[3]), float(m[4])
        t = mm * 60 + ss
        if prev_t is not None and t < prev_t:
            prev_t = 0  # window boundary: new process, clock reset
        if prev_step is not None and it > prev_step and prev_t is not None:
            tranche_s.append((t - prev_t, it - prev_step))
        prev_step, prev_t = it, t
        steps.append(it)
        psnrs.append(ps)
    if not tranche_s:
        raise SystemExit(f"{d}: no parsable tranche times")
    per_step = np.array([s / n for s, n in tranche_s if n > 0])
    ms = float(np.median(per_step)) * 1e3
    return np.asarray(steps), np.asarray(psnrs), ms


def render_psnrs(d: pathlib.Path):
    f = d / "summary.tsv"
    if not f.exists():
        return {}
    out: dict[str, list[float]] = {}
    for ln in f.read_text().splitlines()[1:]:
        parts = ln.split("\t")
        out.setdefault(parts[4], []).append(float(parts[2]))
    return {k: float(np.mean(v)) for k, v in out.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs=2, type=pathlib.Path)
    ap.add_argument("--labels", nargs=2, default=["run_a", "run_b"])
    ap.add_argument("--targets", nargs="*", type=float,
                    default=[25.0, 28.0, 30.0, 32.0])
    args = ap.parse_args()

    parsed = [parse_run(d) for d in args.runs]
    print(f"| metric | {args.labels[0]} | {args.labels[1]} |")
    print("|---|---|---|")
    ms0, ms1 = parsed[0][2], parsed[1][2]
    print(f"| steady-state step time | {ms0:.1f} ms | {ms1:.1f} ms |")
    for t in args.targets:
        cells = []
        for steps, psnrs, ms in parsed:
            hit = steps[psnrs >= t]
            cells.append(f"{hit[0] * ms / 1e3:.0f} s (step {hit[0]})"
                         if hit.size else "never")
        print(f"| time to train-PSNR {t:g} | {cells[0]} | {cells[1]} |")
    peaks = [f"{p.max():.1f} @ {s[p.argmax()]}"
             for s, p, _ in parsed]
    print(f"| peak train PSNR (EMA) | {peaks[0]} | {peaks[1]} |")
    finals = [f"{p[-1]:.1f} @ {s[-1]} ({s[-1] * ms / 1e3:.0f} s)"
              for s, p, ms in parsed]
    print(f"| final train PSNR | {finals[0]} | {finals[1]} |")
    rend = [render_psnrs(d) for d in args.runs]
    for split in ("train", "holdout"):
        if any(split in r for r in rend):
            cells = [f"{r[split]:.2f}" if split in r else "—"
                     for r in rend]
            print(f"| render PSNR ({split} views) | {cells[0]} "
                  f"| {cells[1]} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
