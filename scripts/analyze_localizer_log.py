#!/usr/bin/env python
"""Plot the per-frame localization score from a service/node log.

Reference ``ros2/python/analyze_ros2_log.py``: scrapes ``score = X``
lines from the nerf_based_localizer node's log and plots score vs
frame. Our service (f2nerf_tpu.apps.serve) prints the same line shape,
so this works on either a captured serve stdout log or a ROS2 log
(the ``[nerf_based_localizer]`` prefix is stripped when present).

Usage: python scripts/analyze_localizer_log.py <log_file>
Writes score.png next to the log file.
"""

from __future__ import annotations

import argparse
import pathlib

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402


def parse_scores(lines: list[str]) -> list[float]:
    scores = []
    for line in lines:
        if "score = " not in line:
            continue
        content = line.strip()
        if "[nerf_based_localizer]" in content:  # ROS2 log prefix
            content = content.split("[nerf_based_localizer]")[-1][2:]
        try:
            scores.append(float(content.split("score = ")[-1]))
        except ValueError:
            continue
    return scores


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log_file")
    args = ap.parse_args()
    log_file = pathlib.Path(args.log_file)
    scores = parse_scores(log_file.read_text().splitlines())
    if not scores:
        raise SystemExit("no 'score = ' lines found")
    plt.plot(scores)
    plt.xlabel("Frame")
    plt.ylabel("Score")
    plt.ylim(bottom=0.0)
    save_path = log_file.parent / "score.png"
    plt.savefig(save_path, bbox_inches="tight", pad_inches=0.05)
    print(f"Saved to {save_path}")


if __name__ == "__main__":
    main()
