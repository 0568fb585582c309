"""Pure-Python rosbag2 reader + image/pose extraction tests.

A synthetic .db3 bag is built with the module's own CDR encoder +
sqlite writer, then read back and run through the extraction pipeline
(reference scripts/extract_multi_view_images_from_rosbag.py behavior).
"""

import io
import pathlib
import subprocess
import sys

import numpy as np
import pytest
import yaml

SCRIPTS = pathlib.Path(__file__).parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))

from rosbag_reader import (decode, encode, make_stamp, read_bag,  # noqa
                           stamp_to_sec, write_bag)


def _png_bytes(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="png")
    return buf.getvalue()


def _header(t, frame):
    return {"stamp": make_stamp(t), "frame_id": frame}


def _pose_msg(t, xyz, quat):
    return {
        "header": _header(t, "map"),
        "pose": {"pose": {
            "position": dict(zip("xyz", map(float, xyz))),
            "orientation": dict(zip("xyzw", map(float, quat)))},
            "covariance": [0.0] * 36}}


class TestCdrRoundtrip:
    def test_pose_roundtrip(self):
        msg = _pose_msg(12.25, [1, 2, 3], [0, 0, 0, 1])
        t = "geometry_msgs/msg/PoseWithCovarianceStamped"
        out = decode(encode(msg, t), t)
        assert out["header"]["frame_id"] == "map"
        assert stamp_to_sec(out["header"]["stamp"]) == pytest.approx(
            12.25)
        assert out["pose"]["pose"]["position"]["y"] == 2.0

    def test_compressed_image_roundtrip(self, rng):
        img = (rng.random((8, 6, 3)) * 255).astype(np.uint8)
        msg = {"header": _header(1.5, "camera0"),
               "format": "png", "data": _png_bytes(img)}
        t = "sensor_msgs/msg/CompressedImage"
        out = decode(encode(msg, t), t)
        from PIL import Image
        back = np.asarray(Image.open(io.BytesIO(out["data"])))
        np.testing.assert_array_equal(back, img)

    def test_camera_info_roundtrip(self):
        msg = {"header": _header(0.0, "camera0"),
               "height": 480, "width": 640,
               "distortion_model": "plumb_bob",
               "d": [0.1, -0.05, 0.0, 0.0, 0.0],
               "k": [500.0, 0, 320, 0, 500, 240, 0, 0, 1],
               "r": [1.0, 0, 0, 0, 1, 0, 0, 0, 1],
               "p": [500.0, 0, 320, 0, 0, 500, 240, 0, 0, 0, 1, 0],
               "binning_x": 0, "binning_y": 0,
               "roi": {"x_offset": 0, "y_offset": 0, "height": 0,
                       "width": 0, "do_rectify": 0}}
        t = "sensor_msgs/msg/CameraInfo"
        out = decode(encode(msg, t), t)
        assert out["k"][0] == 500.0 and out["width"] == 640
        assert out["d"] == msg["d"]

    def test_tf_message(self):
        msg = {"transforms": [{
            "header": _header(2.0, "base_link"),
            "child_frame_id": "camera0",
            "transform": {
                "translation": {"x": 0.5, "y": 0.0, "z": 1.0},
                "rotation": {"x": 0, "y": 0, "z": 0, "w": 1}}}]}
        t = "tf2_msgs/msg/TFMessage"
        out = decode(encode(msg, t), t)
        assert out["transforms"][0]["child_frame_id"] == "camera0"


def _build_bag(path, rng, n_frames=5):
    pose_t = "geometry_msgs/msg/PoseWithCovarianceStamped"
    img_t = "sensor_msgs/msg/CompressedImage"
    info_t = "sensor_msgs/msg/CameraInfo"
    msgs = []
    imgs = []
    for k in range(n_frames + 2):   # poses bracket the images
        t = 10.0 + k
        msgs.append(("/localization/pose_estimator/pose_with_covariance",
                     pose_t, int(t * 1e9),
                     encode(_pose_msg(t, [k * 1.0, 0.0, 0.0],
                                      [0, 0, 0, 1]), pose_t)))
    for k in range(n_frames):
        t = 10.7 + k
        img = (rng.random((8, 6, 3)) * 255).astype(np.uint8)
        imgs.append(img)
        msgs.append(("/sensing/camera/camera0/image_rect_color/"
                     "compressed", img_t, int(t * 1e9),
                     encode({"header": _header(t, "camera0"),
                             "format": "png",
                             "data": _png_bytes(img)}, img_t)))
    msgs.append(("/sensing/camera/camera0/camera_info", info_t,
                 int(10.0 * 1e9),
                 encode({"header": _header(10.0, "camera0"),
                         "height": 8, "width": 6,
                         "distortion_model": "plumb_bob",
                         "d": [0.0] * 5,
                         "k": [5.0, 0, 3, 0, 5, 4, 0, 0, 1],
                         "r": [1.0, 0, 0, 0, 1, 0, 0, 0, 1],
                         "p": [5.0, 0, 3, 0, 0, 5, 4, 0, 0, 0, 1, 0],
                         "binning_x": 0, "binning_y": 0,
                         "roi": {"x_offset": 0, "y_offset": 0,
                                 "height": 0, "width": 0,
                                 "do_rectify": 0}}, info_t)))
    write_bag(str(path), msgs)
    return imgs


class TestBagReadWrite:
    def test_time_ordered_read(self, tmp_path, rng):
        bag = tmp_path / "test.db3"
        _build_bag(bag, rng)
        ts = [t for _, _, t, _ in read_bag(str(bag))]
        assert ts == sorted(ts)
        topics = {n for n, _, _, _ in read_bag(str(bag))}
        assert len(topics) == 3


class TestExtraction:
    def test_end_to_end(self, tmp_path, rng):
        bag = tmp_path / "test.db3"
        imgs = _build_bag(bag, rng)
        calib = {"base_link": {"sensor_kit_base_link":
                               {"x": 0.5, "yaw": 0.1}},
                 "sensor_kit_base_link": {"camera0": {"z": 1.0}}}
        calib_p = tmp_path / "calib.yaml"
        calib_p.write_text(yaml.safe_dump(calib))
        out = tmp_path / "out"
        r = subprocess.run(
            [sys.executable, str(SCRIPTS / "extract_images_from_rosbag.py"),
             str(bag), str(calib_p), str(out),
             "--image_topics",
             "/sensing/camera/camera0/image_rect_color/compressed"],
            capture_output=True, text=True,
            env={"PYTHONPATH": str(SCRIPTS.parent), "PATH": "/usr/bin:/bin",
                 "JAX_PLATFORMS": "cpu", "HOME": "/root"})
        assert r.returncode == 0, r.stderr[-2000:]
        pngs = sorted((out / "images").glob("*.png"))
        assert len(pngs) == len(imgs)
        rows = (out / "pose.tsv").read_text().strip().split("\n")
        assert len(rows) == len(imgs) + 1  # header
        # pose x moves 1 unit/s; image 0 is at t = 10.7 -> interpolated
        # x = 0.7, plus the base_link->camera offset: t_b2c =
        # [0.5,0,0] + Rz(0.1) @ [0,0,1] = [0.5, 0, 1] -> x += 0.5
        first = rows[1].split("\t")
        x = float(first[2])
        assert x == pytest.approx(1.2, abs=1e-6)
        # z = base z (0) + (Rot(identity quat) @ t_b2c).z = 1.0 — the
        # pre-fix quat scramble read identity as a 180-deg x-flip and
        # produced z = -1 here (only x was asserted, masking it)
        z = float(first[4])
        assert z == pytest.approx(1.0, abs=1e-6)
        # cam quat = q_b2c * identity = Rz(0.1) in (qx,qy,qz,qw) order
        qx, qy, qz, qw = (float(v) for v in first[5:9])
        assert (qx, qy) == pytest.approx((0.0, 0.0), abs=1e-6)
        assert qz == pytest.approx(np.sin(0.05), abs=1e-6)
        assert qw == pytest.approx(np.cos(0.05), abs=1e-6)
        assert (out / "camera_info.yaml").exists()
        from PIL import Image
        got = np.asarray(Image.open(pngs[0]))
        np.testing.assert_array_equal(got, imgs[0])


class TestMcap:
    def test_roundtrip_plain_and_zstd(self, tmp_path, rng):
        from rosbag_reader import read_bag_any, read_bag_mcap, write_bag_mcap
        ref = _build_bag(tmp_path / "ref.db3", rng)
        del ref
        msgs = list(read_bag(str(tmp_path / "ref.db3")))
        for comp in ("", "zstd"):
            p = tmp_path / f"bag_{comp or 'none'}.mcap"
            write_bag_mcap(str(p), msgs, compression=comp)
            back = list(read_bag_mcap(str(p)))
            assert back == msgs          # same (topic, type, ts, bytes)
            # dispatch helper picks the mcap path by extension
            assert list(read_bag_any(str(p))) == msgs

    def test_topic_filter_and_magic_check(self, tmp_path, rng):
        from rosbag_reader import read_bag_mcap, write_bag_mcap
        _build_bag(tmp_path / "ref.db3", rng)
        msgs = list(read_bag(str(tmp_path / "ref.db3")))
        p = tmp_path / "bag.mcap"
        write_bag_mcap(str(p), msgs, compression="zstd")
        only = [m for m in read_bag_mcap(
            str(p), topics=[msgs[0][0]])]
        assert only and all(m[0] == msgs[0][0] for m in only)
        bad = tmp_path / "bad.mcap"
        bad.write_bytes(b"not an mcap")
        with pytest.raises(RuntimeError):
            list(read_bag_mcap(str(bad)))

    def test_extraction_from_mcap(self, tmp_path, rng):
        """The end-to-end extraction pipeline reads .mcap via the
        dispatching reader."""
        from rosbag_reader import write_bag_mcap
        imgs = _build_bag(tmp_path / "ref.db3", rng)
        msgs = list(read_bag(str(tmp_path / "ref.db3")))
        bag = tmp_path / "bag.mcap"
        write_bag_mcap(str(bag), msgs, compression="zstd")
        calib = {"base_link": {"sensor_kit_base_link": {"x": 0.5}},
                 "sensor_kit_base_link": {"camera0": {"z": 1.0}}}
        calib_p = tmp_path / "calib.yaml"
        calib_p.write_text(yaml.safe_dump(calib))
        out = tmp_path / "out"
        r = subprocess.run(
            [sys.executable, str(SCRIPTS / "extract_images_from_rosbag.py"),
             str(bag), str(calib_p), str(out),
             "--image_topics",
             "/sensing/camera/camera0/image_rect_color/compressed"],
            capture_output=True, text=True,
            env={"PYTHONPATH": str(SCRIPTS.parent), "PATH": "/usr/bin:/bin",
                 "JAX_PLATFORMS": "cpu", "HOME": "/root"})
        assert r.returncode == 0, r.stderr[-2000:]
        assert len(sorted((out / "images").glob("*.png"))) == len(imgs)
