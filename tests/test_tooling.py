"""Analysis/ops tooling tests: particle-log analyzers, log scraper,
offset updater, camera_info loaders, and the serve particle dump."""

import pathlib
import sys

import numpy as np

SCRIPTS = pathlib.Path(__file__).parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))


def _write_particle_tsv(path, poses, weights):
    cols = [f"m{i}{j}" for i in range(3) for j in range(4)] + ["weight"]
    lines = ["\t".join(cols)]
    for pose, w in zip(poses, weights):
        lines.append("\t".join(f"{v:.6f}" for v in pose.ravel())
                     + f"\t{w:.6f}")
    path.write_text("\n".join(lines) + "\n")


def _random_poses(rng, n):
    from scipy.spatial.transform import Rotation
    poses = []
    for _ in range(n):
        r = Rotation.from_rotvec(rng.normal(0, 0.1, 3)).as_matrix()
        poses.append(np.concatenate([r, rng.normal(0, 1, (3, 1))], 1))
    return np.stack(poses)


def test_particle_tsv_roundtrip(tmp_path, rng):
    from analyze_particles_log import load_particles
    poses = _random_poses(rng, 5)
    weights = rng.uniform(0.1, 1.0, 5)
    _write_particle_tsv(tmp_path / "p.tsv", poses, weights)
    p2, w2 = load_particles(tmp_path / "p.tsv")
    np.testing.assert_allclose(p2, poses, atol=1e-5)
    np.testing.assert_allclose(w2, weights, atol=1e-5)


def test_rotation_average_recovers_common_rotation(rng):
    from analyze_particles_log import rotation_average
    from scipy.spatial.transform import Rotation
    base = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    # symmetric perturbations around base -> average should stay near base
    vs = rng.normal(0, 0.05, (20, 3))
    vs = np.concatenate([vs, -vs])
    rots = np.stack([
        base @ Rotation.from_rotvec(v).as_matrix() for v in vs])
    w = np.full(len(rots), 1.0 / len(rots))
    avg = rotation_average(rots, w)
    np.testing.assert_allclose(avg, base, atol=1e-6)
    np.testing.assert_allclose(avg @ avg.T, np.eye(3), atol=1e-8)


def test_log_score_scraper():
    from analyze_localizer_log import parse_scores
    lines = [
        "startup noise",
        "score = 12.5",
        "[INFO] [17.2] [nerf_based_localizer]: score = 16.0",
        "not a score line",
        "score = 9.75",
    ]
    assert parse_scores(lines) == [12.5, 16.0, 9.75]


def test_modified_offset_updates_yaml(tmp_path, rng):
    import subprocess
    import yaml
    from scipy.spatial.transform import Rotation
    poses = _random_poses(rng, 4)
    weights = np.array([0.2, 0.1, 0.9, 0.3])
    _write_particle_tsv(tmp_path / "p.tsv", poses, weights)
    params = {"node": {"ros__parameters": {
        "offset_position_x": 0.0, "offset_position_y": 0.0,
        "offset_position_z": 0.0, "offset_rotation_w": 1.0,
        "offset_rotation_x": 0.0, "offset_rotation_y": 0.0,
        "offset_rotation_z": 0.0}}}
    yp = tmp_path / "params.yaml"
    yp.write_text(yaml.safe_dump(params))
    subprocess.run(
        [sys.executable, str(SCRIPTS / "modified_offset_by_particles_log.py"),
         str(tmp_path / "p.tsv"), "--params_yaml", str(yp), "--write"],
        check=True, capture_output=True)
    got = yaml.safe_load(yp.read_text())["node"]["ros__parameters"]
    diff_pos = poses[2][:3, 3] - poses[0][:3, 3]
    np.testing.assert_allclose(
        [got["offset_position_x"], got["offset_position_y"],
         got["offset_position_z"]], diff_pos, atol=1e-5)
    diff_rot = poses[2][:3, :3] @ poses[0][:3, :3].T
    q = Rotation.from_matrix(diff_rot).as_quat()
    got_q = np.array([got["offset_rotation_x"], got["offset_rotation_y"],
                      got["offset_rotation_z"], got["offset_rotation_w"]])
    if np.dot(got_q, q) < 0:
        q = -q
    np.testing.assert_allclose(got_q, q, atol=1e-5)


def test_camera_info_loader_both_formats(tmp_path):
    import yaml
    from rectify_images import load_camera_info
    k = [100, 0, 24, 0, 100, 16, 0, 0, 1]
    d = [0.01, 0.0, 0.0, 0.0, 0.0]
    (tmp_path / "a.yaml").write_text(yaml.safe_dump({"K": k, "D": d}))
    (tmp_path / "b.yaml").write_text(yaml.safe_dump({
        "camera_matrix": {"rows": 3, "cols": 3, "data": k},
        "distortion_coefficients": {"rows": 1, "cols": 5, "data": d}}))
    ka, da = load_camera_info(tmp_path / "a.yaml")
    kb, db = load_camera_info(tmp_path / "b.yaml")
    np.testing.assert_allclose(ka, kb)
    np.testing.assert_allclose(da, db)
    assert ka.shape == (3, 3)


def test_serve_particle_dump(tmp_path, rng):
    from analyze_particles_log import load_particles
    from f2nerf_tpu.apps.serve import LocalizerService
    from f2nerf_tpu.localize.localizer import Particle
    svc = LocalizerService(localizer=None,
                           save_particles_dir=str(tmp_path / "particles"))
    poses = _random_poses(rng, 3)
    particles = [Particle(pose=p, weight=float(w))
                 for p, w in zip(poses, rng.uniform(0.1, 1, 3))]
    svc._dump_particles(particles)
    svc._dump_particles(particles)
    files = sorted((tmp_path / "particles").glob("*.tsv"))
    assert [f.name for f in files] == ["00000000.tsv", "00000001.tsv"]
    p2, w2 = load_particles(files[0])
    np.testing.assert_allclose(p2, poses, atol=1e-5)
    assert len(w2) == 3


def test_parse_run_cumulative_and_windowed(tmp_path):
    """compare_time_to_psnr.parse_run reads the log's cumulative Time
    column as deltas between report lines, restarting from 0 at a clock
    regression (a resumed process window) — ADVICE r2: the previous
    revision read each line's time as a per-tranche duration, inflating
    CLI-trainer (one long run, report_freq=200) per-step times."""
    from compare_time_to_psnr import parse_run

    # one-process cumulative log: 200 steps per 20 s -> 100 ms/step
    lines = [
        "Time: 00:20 Iter:    200 PSNR: 20.000000 LOSS: 0.1 LR: 0.01",
        "Time: 00:40 Iter:    400 PSNR: 21.000000 LOSS: 0.1 LR: 0.01",
        "Time: 01:00 Iter:    600 PSNR: 22.000000 LOSS: 0.1 LR: 0.01",
    ]
    d = tmp_path / "a"
    d.mkdir()
    (d / "train_log.txt").write_text("\n".join(lines) + "\n")
    steps, psnrs, ms = parse_run(d)
    assert list(steps) == [200, 400, 600]
    assert ms == 100.0

    # windowed log: clock resets at the window boundary; the boundary
    # line's tranche is measured from 0 (the new process started there)
    lines += [
        "Time: 00:20 Iter:    800 PSNR: 23.000000 LOSS: 0.1 LR: 0.01",
        "Time: 00:40 Iter:   1000 PSNR: 24.000000 LOSS: 0.1 LR: 0.01",
    ]
    d2 = tmp_path / "b"
    d2.mkdir()
    (d2 / "train_log.txt").write_text("\n".join(lines) + "\n")
    steps, psnrs, ms = parse_run(d2)
    assert list(steps) == [200, 400, 600, 800, 1000]
    assert ms == 100.0
