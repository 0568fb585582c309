"""Dataset-prep script tests: COLMAP reader/converter, LLFF converter,
pose-TSV converter, trajectory interpolation."""

import pathlib
import sys

import numpy as np
import pytest

SCRIPTS = pathlib.Path(__file__).parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))

from colmap_reader import (Camera, Image, Model, load_model,  # noqa: E402
                           write_model_txt)


@pytest.fixture()
def colmap_model(rng):
    cams = {1: Camera("PINHOLE", 64, 48,
                      np.array([50.0, 50.0, 32.0, 24.0]))}
    imgs = {}
    for i in range(4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        imgs[i + 1] = Image(f"im_{i:03d}.png", 1, q,
                            rng.normal(size=3))
    pts = rng.normal(0, 1.0, (50, 3))
    vis = [[(j % 4) + 1, ((j + 1) % 4) + 1] for j in range(50)]
    return Model(cameras=cams, images=imgs, points=pts,
                 point_image_ids=vis)


def test_colmap_txt_roundtrip(tmp_path, colmap_model):
    write_model_txt(colmap_model, tmp_path)
    back = load_model(tmp_path)
    assert back.cameras[1].model == "PINHOLE"
    np.testing.assert_allclose(back.cameras[1].k,
                               colmap_model.cameras[1].k)
    for iid in colmap_model.images:
        np.testing.assert_allclose(back.images[iid].qvec,
                                   colmap_model.images[iid].qvec,
                                   atol=1e-8)
    assert len(back.points) == 50
    assert back.point_image_ids[0] == [1, 2]


def test_colmap2poses(tmp_path, colmap_model):
    from colmap2poses import convert
    write_model_txt(colmap_model, tmp_path / "sparse" / "0")
    data = convert(tmp_path, model_subdir="sparse/0")
    assert data.shape == (4, 27)
    # poses orthonormal
    for row in data:
        r = row[:12].reshape(3, 4)[:, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    # near < far, both positive
    assert (data[:, 25] < data[:, 26]).all()
    # tsv loads through the Dataset parser header path
    lines = (tmp_path / "cams_meta.tsv").read_text().splitlines()
    assert len(lines) == 5
    assert len(lines[1].split("\t")) == 27


def test_llff2poses(tmp_path, rng):
    from llff2poses import convert
    n = 3
    poses_hwf = np.zeros((n, 3, 5))
    poses_hwf[:, :3, :3] = np.eye(3)
    poses_hwf[:, :3, 3] = rng.normal(size=(n, 3))
    poses_hwf[:, 0, 4] = 48
    poses_hwf[:, 1, 4] = 64
    poses_hwf[:, 2, 4] = 50.0
    bounds = np.abs(rng.normal(2, 0.5, (n, 2)))
    pb = np.concatenate([poses_hwf.reshape(n, 15), bounds], -1)
    np.save(tmp_path / "poses_bounds.npy", pb)
    data = convert(tmp_path)
    assert data.shape == (n, 27)
    assert data[0, 12] == 50.0        # fx
    assert data[0, 14] == 32.0        # cx = w/2


def test_pose_tsv_converter(tmp_path):
    from convert_pose_tsv_to_f2_format import convert
    rows = ["timestamp\tx\ty\tz\tqx\tqy\tqz\tqw"]
    for i in range(3):
        rows.append(f"{i}\t{i * 1.0}\t0.5\t0.2\t0\t0\t0\t1")
    (tmp_path / "pose.tsv").write_text("\n".join(rows) + "\n")
    (tmp_path / "camera_info.yaml").write_text(
        "D: [0.1, 0.2, 0.0, 0.0, 0.0]\n"
        "K: [500, 0, 320, 0, 500, 240, 0, 0, 1]\n")
    data = convert(str(tmp_path / "pose.tsv"))
    assert data.shape == (3, 27)
    assert (tmp_path / "cams_meta.tsv").exists()
    # identity world rotation maps through the axis conversion
    r = data[0, :12].reshape(3, 4)[:, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(data[0, 25:27], [1.0, 30.0])


def test_inter_poses(rng):
    from inter_poses import interpolate_poses
    a = np.eye(3, 4, dtype=np.float32)
    b = a.copy()
    b[:3, 3] = [2.0, 0.0, 0.0]
    th = 0.5
    b[:3, :3] = [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                 [-np.sin(th), 0, np.cos(th)]]
    traj = interpolate_poses(np.stack([a, b]), 5)
    assert traj.shape == (5, 3, 4)
    np.testing.assert_allclose(traj[0], a, atol=1e-6)
    np.testing.assert_allclose(traj[-1], b, atol=1e-6)
    # midpoint translation is halfway, rotations stay orthonormal
    np.testing.assert_allclose(traj[2][:3, 3], [1.0, 0, 0], atol=1e-6)
    for p in traj:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3),
                                   atol=1e-6)


def test_umeyama_alignment(rng):
    from match_two_trajectories import align
    src = rng.normal(0, 1, (50, 3))
    th = 0.7
    r = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    dst = 1.7 * src @ r.T + np.array([2.0, -1.0, 0.5])
    out = align(src, dst)
    np.testing.assert_allclose(out["scale"], 1.7, rtol=1e-6)
    assert out["rmse"] < 1e-9
    np.testing.assert_allclose(out["rotation"], r, atol=1e-8)


def test_timestamp_interpolation(tmp_path):
    from interpolate import interpolate_at, load_pose_tsv
    rows = ["timestamp\tx\ty\tz\tqx\tqy\tqz\tqw",
            "0.0\t0\t0\t0\t0\t0\t0\t1",
            "1.0\t2\t0\t0\t0\t0\t0\t1",
            "2.0\t2\t2\t0\t0\t0\t0.7071068\t0.7071068"]
    p = tmp_path / "pose.tsv"
    p.write_text("\n".join(rows) + "\n")
    ts, xyz, quat = load_pose_tsv(p)
    xq, qq = interpolate_at(ts, xyz, quat, np.array([0.5, 1.5, 3.0]))
    np.testing.assert_allclose(xq[0], [1, 0, 0], atol=1e-9)
    np.testing.assert_allclose(xq[1], [2, 1, 0], atol=1e-9)
    np.testing.assert_allclose(xq[2], [2, 2, 0], atol=1e-9)  # clamped
    np.testing.assert_allclose(np.linalg.norm(qq, axis=1), 1.0,
                               atol=1e-9)


def test_pose_reflector_handle():
    from pose_reflector import handle
    r = handle({"cmd": "align", "pose": [[1.0, 2.0]], "covariance": [0.1]})
    assert r["ok"] and r["success"]
    assert r["pose"] == [[1.0, 2.0]] and r["covariance"] == [0.1]
    assert handle({"cmd": "trigger", "data": True})["success"]
    assert not handle({"cmd": "bogus"})["ok"]


def test_pose_reflector_server_roundtrip():
    import json
    import socket
    import threading

    import pose_reflector

    srv = pose_reflector.serve(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with socket.create_connection(srv.server_address, timeout=10) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"cmd": "align", "pose": [1, 2, 3]}) + "\n")
            f.flush()
            r = json.loads(f.readline())
        assert r["ok"] and r["pose"] == [1, 2, 3]
    finally:
        srv.shutdown()


def test_replay_load_poses_and_test_mode(tmp_path):
    import replay_dataset as rd

    # pose.tsv source
    rows = ["timestamp\tx\ty\tz\tqx\tqy\tqz\tqw",
            "0.0\t1\t2\t3\t0\t0\t0\t1",
            "1.0\t4\t5\t6\t0\t0\t0.7071068\t0.7071068"]
    (tmp_path / "pose.tsv").write_text("\n".join(rows) + "\n")
    poses = rd.load_poses(tmp_path, "auto")
    assert poses.shape == (2, 4, 4)
    np.testing.assert_allclose(poses[0, :3, 3], [1, 2, 3])
    np.testing.assert_allclose(poses[1, :3, :3],
                               [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)

    # cams_meta source
    cams = np.zeros((3, 27), np.float32)
    cams[:, :12] = np.tile(np.eye(4)[:3].ravel(), (3, 1))
    np.save(tmp_path / "cams_meta.npy", cams)
    poses2 = rd.load_poses(tmp_path, "cams_meta")
    assert poses2.shape == (3, 4, 4)
    np.testing.assert_allclose(poses2[0], np.eye(4))

    # test_mode: 7 perturbed copies of frame 0 (reference main.py)
    tposes, timgs = rd.apply_test_mode(poses, ["a.png", "b.png"])
    assert tposes.shape == (7, 4, 4) and timgs == ["a.png"] * 7
    np.testing.assert_allclose(tposes[1, 0, 3] - poses[0, 0, 3], 1.0)
    np.testing.assert_allclose(tposes[2, 1, 3] - poses[0, 1, 3], 2.0)
    np.testing.assert_allclose(tposes[3, 2, 3] - poses[0, 2, 3], 0.6)
    for i in range(4, 7):  # rotated copies stay orthonormal
        r = tposes[i, :3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert not np.allclose(r, poses[0, :3, :3])
