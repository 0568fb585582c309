"""ROS2 relay node tests with a mocked rclpy (rclpy is not part of this
environment; the node is import-gated exactly like LPIPS in eval.py)."""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest


# -- pure conversion helpers (no rclpy needed) ------------------------------

class _Vec:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x, self.y, self.z = x, y, z


class _Quat:
    def __init__(self, w=1.0, x=0.0, y=0.0, z=0.0):
        self.w, self.x, self.y, self.z = w, x, y, z


class _Pose:
    def __init__(self):
        self.position = _Vec()
        self.orientation = _Quat()


def test_pose_roundtrip():
    from f2nerf_tpu.apps import ros2_node as rn

    rng = np.random.default_rng(0)
    # random rotation via QR, random translation
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = q
    m[:3, 3] = rng.standard_normal(3)
    msg = rn.matrix_to_pose_msg(_Pose, m)
    back = rn.pose_msg_to_matrix(msg.position, msg.orientation)
    np.testing.assert_allclose(back, m, atol=1e-5)


# Independently-constructed (ROS-field-order quaternion, matrix) pairs.
# These are NOT roundtrips: each side is written down by hand, so an
# order scramble inside the converters cannot cancel (the round-2 review
# found exactly such a masked scramble at this boundary).
S2 = np.sqrt(0.5)
KNOWN_ROTATIONS = [
    # (qx, qy, qz, qw), rotation matrix
    ((0.0, 0.0, 0.0, 1.0), np.eye(3)),
    ((S2, 0.0, 0.0, S2),                       # +90 deg about x
     np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])),
    ((0.0, S2, 0.0, S2),                       # +90 deg about y
     np.array([[0, 0, 1.0], [0, 1.0, 0], [-1.0, 0, 0]])),
    ((0.0, 0.0, S2, S2),                       # +90 deg about z
     np.array([[0, -1.0, 0], [1.0, 0, 0], [0, 0, 1.0]])),
]


def test_pose_msg_to_matrix_known_rotations():
    """geometry_msgs field order (x,y,z,w) -> the right matrix."""
    from f2nerf_tpu.apps import ros2_node as rn

    for (qx, qy, qz, qw), r_expect in KNOWN_ROTATIONS:
        pose = _Pose()
        pose.orientation = _Quat(w=qw, x=qx, y=qy, z=qz)
        pose.position = _Vec(1.0, 2.0, 3.0)
        m = rn.pose_msg_to_matrix(pose.position, pose.orientation)
        np.testing.assert_allclose(m[:3, :3], r_expect, atol=1e-6)
        np.testing.assert_allclose(m[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)


def test_matrix_to_pose_msg_known_rotations():
    from f2nerf_tpu.apps import ros2_node as rn

    for (qx, qy, qz, qw), r in KNOWN_ROTATIONS:
        m = np.eye(4)
        m[:3, :3] = r
        msg = rn.matrix_to_pose_msg(_Pose, m)
        got = np.array([msg.orientation.x, msg.orientation.y,
                        msg.orientation.z, msg.orientation.w])
        expect = np.array([qx, qy, qz, qw])
        if np.dot(got, expect) < 0:  # q and -q encode the same rotation
            got = -got
        np.testing.assert_allclose(got, expect, atol=1e-6)


class _Header:
    def __init__(self):
        self.frame_id = ""
        self.stamp = 0


class _Image:
    def __init__(self):
        self.header = _Header()
        self.height = 0
        self.width = 0
        self.encoding = "rgb8"
        self.step = 0
        self.data = b""


def test_image_roundtrip_and_bgr():
    from f2nerf_tpu.apps import ros2_node as rn

    rng = np.random.default_rng(1)
    img = rng.random((6, 5, 3)).astype(np.float32)
    msg = rn.array_to_image_msg(_Image, img, "map", 7)
    assert msg.encoding == "rgb8" and msg.header.frame_id == "map"
    back = rn.image_msg_to_array(msg)
    np.testing.assert_allclose(back, img, atol=1 / 255.0)

    bgr = _Image()
    bgr.height, bgr.width, bgr.encoding = 2, 2, "bgr8"
    arr = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    bgr.data = arr.tobytes()
    out = rn.image_msg_to_array(bgr)
    np.testing.assert_allclose(out[..., 0], arr[..., 2] / 255.0)
    # crop_rows keeps the top rows (reference crops to 850,
    # nerf_based_localizer.cpp:225-235)
    out1 = rn.image_msg_to_array(bgr, crop_rows=1)
    assert out1.shape == (1, 2, 3)


def test_output_covariance_matches_reference_fill():
    from f2nerf_tpu.apps import ros2_node as rn

    cov = rn.output_covariance_diag(0.1)
    assert cov.shape == (36,)
    np.testing.assert_allclose(cov[[0, 7, 14]], 0.1)
    np.testing.assert_allclose(cov[[21, 28, 35]], 1.0)
    assert np.count_nonzero(cov) == 6


# -- node behavior with mocked rclpy ---------------------------------------

class _FakeLogger:
    def __init__(self):
        self.errors = []

    def error(self, msg):
        self.errors.append(msg)

    def info(self, msg):
        pass


class _FakeNode:
    """Stands in for rclpy.node.Node."""

    def __init__(self, name):
        self.name = name
        self._logger = _FakeLogger()

    def create_subscription(self, *a, **k):
        return None

    def create_publisher(self, cls, topic, depth):
        pub = types.SimpleNamespace(topic=topic, published=[])
        pub.publish = pub.published.append
        return pub

    def create_service(self, *a, **k):
        return None

    def get_logger(self):
        return self._logger


class _FakeService:
    """Stands in for apps.serve.LocalizerService."""

    def __init__(self):
        self.requests = []

    def handle(self, req):
        self.requests.append(req)
        if req["cmd"] == "init_pose":
            return {"ok": True}
        return {"ok": True, "pose": np.eye(4).tolist(), "score": 42.0,
                "noise_coeff": 1.0,
                "rendered": np.zeros((2, 2, 3)).tolist()}


@pytest.fixture
def mocked_node(monkeypatch):
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        monkeypatch.setitem(sys.modules, name, m)
        return m

    class PoseStamped:
        def __init__(self):
            self.header = _Header()
            self.pose = _Pose()

    class PoseWithCov:
        def __init__(self):
            self.header = _Header()
            self.pose = types.SimpleNamespace(pose=_Pose(),
                                              covariance=[0.0] * 36)

    class Float32:
        def __init__(self):
            self.data = 0.0

    class SetBool:
        Request = types.SimpleNamespace
        Response = types.SimpleNamespace

    mod("rclpy")
    mod("rclpy.node", Node=_FakeNode)
    mod("geometry_msgs")
    mod("geometry_msgs.msg", Pose=_Pose, PoseStamped=PoseStamped,
        PoseWithCovarianceStamped=PoseWithCov)
    mod("sensor_msgs")
    mod("sensor_msgs.msg", Image=_Image)
    mod("std_msgs")
    mod("std_msgs.msg", Float32=Float32)
    mod("std_srvs")
    mod("std_srvs.srv", SetBool=SetBool)

    import f2nerf_tpu.apps.ros2_node as rn
    rn = importlib.reload(rn)
    assert rn.HAVE_RCLPY
    yield rn
    monkeypatch.undo()
    importlib.reload(rn)


def test_node_localize_flow(mocked_node):
    rn = mocked_node
    svc = _FakeService()
    node = rn.NerfBasedLocalizerNode(svc, output_covariance=0.2)

    # not activated -> image dropped with an error log (reference :115-118)
    img = rn.array_to_image_msg(_Image, np.zeros((4, 4, 3)), "cam", 3)
    node.callback_image(img)
    assert svc.requests == []
    assert node.get_logger().errors

    res = types.SimpleNamespace(success=None)
    node.service_trigger_node(types.SimpleNamespace(data=True), res)
    assert res.success and node.is_activated

    # no initial pose yet -> dropped (reference :122-125)
    node.callback_image(img)
    assert svc.requests == []

    init = types.SimpleNamespace(pose=types.SimpleNamespace(pose=_Pose()))
    node.callback_initial_pose(init)
    assert svc.requests[-1]["cmd"] == "init_pose"

    node.callback_image(img)
    assert svc.requests[-1]["cmd"] == "localize"
    assert node.pub_pose.published[0].header.frame_id == "map"
    pc = node.pub_pose_cov.published[0]
    assert pc.pose.covariance[0] == pytest.approx(0.2)
    assert pc.pose.covariance[21] == pytest.approx(2.0)
    assert node.pub_score.published[0].data == 42.0
    assert node.pub_image.published[0].height == 2
    # stamp propagated from the input image (reference :137)
    assert node.pub_pose.published[0].header.stamp == 3
