#!/usr/bin/env python
"""Derive an improved sensor-mount offset from a particle log.

Reference ``ros2/python/modified_offset_by_particles_log.py``: reads
one particle TSV (header m00..m23, weight), takes the delta between the
initial pose (row 0 — the node always evaluates the unperturbed pose
first) and the best-scoring particle, and composes that delta onto the
offset_position_*/offset_rotation_* calibration values of a parameters
YAML, printing the updated block.

Ours is self-contained: pass ``--params_yaml`` to read/update the
current offsets (keys under any mapping containing offset_position_x);
without it, the current offset is taken as identity and the printed
block IS the delta.

Usage:
  python scripts/modified_offset_by_particles_log.py <log.tsv> \
      [--params_yaml params.yaml] [--write]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np
import yaml
from scipy.spatial.transform import Rotation

from analyze_particles_log import load_particles


def find_offset_dict(node):
    """Depth-first search for the mapping holding the offset keys."""
    if isinstance(node, dict):
        if "offset_position_x" in node:
            return node
        for v in node.values():
            found = find_offset_dict(v)
            if found is not None:
                return found
    return None


def main() -> None:
    np.set_printoptions(precision=6, suppress=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("log_file")
    ap.add_argument("--params_yaml", default=None)
    ap.add_argument("--write", action="store_true",
                    help="write the updated offsets back to params_yaml")
    args = ap.parse_args()

    poses, weights = load_particles(pathlib.Path(args.log_file))
    best = int(weights.argmax())
    print(f"best index: {best}")
    print(f"score: {weights[0]} -> {weights[best]}")
    first_pose, best_pose = poses[0], poses[best]
    diff_position = best_pose[:3, 3] - first_pose[:3, 3]
    diff_rotation = best_pose[:3, :3] @ first_pose[:3, :3].T
    print("diff")
    print(diff_position)
    print(Rotation.from_matrix(diff_rotation).as_euler("xyz", degrees=True))

    curr_position = np.zeros(3)
    curr_rotation = np.eye(3)
    params = offset = None
    if args.params_yaml:
        params = yaml.safe_load(pathlib.Path(args.params_yaml).read_text())
        offset = find_offset_dict(params)
        if offset is None:
            raise SystemExit("params_yaml has no offset_position_x key")
        curr_position = np.array([offset["offset_position_x"],
                                  offset["offset_position_y"],
                                  offset["offset_position_z"]])
        curr_rotation = Rotation.from_quat([
            offset["offset_rotation_x"], offset["offset_rotation_y"],
            offset["offset_rotation_z"], offset["offset_rotation_w"],
        ]).as_matrix()

    next_position = curr_position + diff_position
    next_quat = Rotation.from_matrix(
        diff_rotation @ curr_rotation).as_quat()  # (x, y, z, w)

    print("next")
    for axis, v in zip("xyz", next_position):
        print(f"    offset_position_{axis}: {v:.6f}")
    print(f"    offset_rotation_w: {next_quat[3]:.6f}")
    for axis, v in zip("xyz", next_quat[:3]):
        print(f"    offset_rotation_{axis}: {v:.6f}")

    if args.write and offset is not None:
        for axis, v in zip("xyz", next_position):
            offset[f"offset_position_{axis}"] = float(v)
        offset["offset_rotation_w"] = float(next_quat[3])
        for axis, v in zip("xyz", next_quat[:3]):
            offset[f"offset_rotation_{axis}"] = float(v)
        pathlib.Path(args.params_yaml).write_text(
            yaml.safe_dump(params, sort_keys=False))
        print(f"updated {args.params_yaml}")


if __name__ == "__main__":
    main()
