"""Pure-Python rosbag2 reader (sqlite3 storage + CDR payloads).

The reference's rosbag tooling
(``scripts/extract_multi_view_images_from_rosbag.py``,
``scripts/parse_rosbag_with_time_align.py``) depends on rclpy /
rosbag2_py / cv_bridge, none of which exist off-robot. A rosbag2 ``.db3``
file is, however, just a sqlite database (tables ``topics`` +
``messages``) whose message blobs are CDR-encoded — both trivially
readable with the standard library. This module implements:

* :func:`read_bag` — iterate (topic, type, timestamp, raw CDR bytes),
* a declarative CDR codec (:func:`decode` / :func:`encode`) for the
  message types the NeRF data pipeline needs (images, camera info,
  poses, tf),
* :func:`write_bag` — the inverse, used by tests and by
  ``pose_and_image_publisher``-style dataset replay.

CDR notes (XCDR1, the rosbag2 default): 4-byte encapsulation header
(0x00 0x01 = little-endian) followed by fields aligned to their
primitive size *relative to the byte after the header*; ``string`` is a
uint32 length (including NUL) + bytes + NUL; unbounded sequences are a
uint32 count + elements; fixed arrays have no count.
"""

from __future__ import annotations

import sqlite3
import struct
from typing import Any, Iterator

# --------------------------------------------------------------------------
# message type specs: list of (field_name, type) where type is a primitive
# code, another spec name, ("seq", elem) for unbounded sequences, or
# ("arr", elem, n) for fixed arrays.
# --------------------------------------------------------------------------

SPECS: dict[str, list[tuple]] = {
    "builtin_interfaces/msg/Time": [("sec", "i4"), ("nanosec", "u4")],
    "std_msgs/msg/Header": [
        ("stamp", "builtin_interfaces/msg/Time"), ("frame_id", "str")],
    "geometry_msgs/msg/Vector3": [
        ("x", "f8"), ("y", "f8"), ("z", "f8")],
    "geometry_msgs/msg/Point": [("x", "f8"), ("y", "f8"), ("z", "f8")],
    "geometry_msgs/msg/Quaternion": [
        ("x", "f8"), ("y", "f8"), ("z", "f8"), ("w", "f8")],
    "geometry_msgs/msg/Pose": [
        ("position", "geometry_msgs/msg/Point"),
        ("orientation", "geometry_msgs/msg/Quaternion")],
    "geometry_msgs/msg/PoseStamped": [
        ("header", "std_msgs/msg/Header"),
        ("pose", "geometry_msgs/msg/Pose")],
    "geometry_msgs/msg/PoseWithCovariance": [
        ("pose", "geometry_msgs/msg/Pose"),
        ("covariance", ("arr", "f8", 36))],
    "geometry_msgs/msg/PoseWithCovarianceStamped": [
        ("header", "std_msgs/msg/Header"),
        ("pose", "geometry_msgs/msg/PoseWithCovariance")],
    "geometry_msgs/msg/Transform": [
        ("translation", "geometry_msgs/msg/Vector3"),
        ("rotation", "geometry_msgs/msg/Quaternion")],
    "geometry_msgs/msg/TransformStamped": [
        ("header", "std_msgs/msg/Header"),
        ("child_frame_id", "str"),
        ("transform", "geometry_msgs/msg/Transform")],
    "tf2_msgs/msg/TFMessage": [
        ("transforms", ("seq", "geometry_msgs/msg/TransformStamped"))],
    "sensor_msgs/msg/CompressedImage": [
        ("header", "std_msgs/msg/Header"),
        ("format", "str"), ("data", ("seq", "u1"))],
    "sensor_msgs/msg/Image": [
        ("header", "std_msgs/msg/Header"),
        ("height", "u4"), ("width", "u4"), ("encoding", "str"),
        ("is_bigendian", "u1"), ("step", "u4"), ("data", ("seq", "u1"))],
    "sensor_msgs/msg/RegionOfInterest": [
        ("x_offset", "u4"), ("y_offset", "u4"), ("height", "u4"),
        ("width", "u4"), ("do_rectify", "u1")],
    "sensor_msgs/msg/CameraInfo": [
        ("header", "std_msgs/msg/Header"),
        ("height", "u4"), ("width", "u4"), ("distortion_model", "str"),
        ("d", ("seq", "f8")), ("k", ("arr", "f8", 9)),
        ("r", ("arr", "f8", 9)), ("p", ("arr", "f8", 12)),
        ("binning_x", "u4"), ("binning_y", "u4"),
        ("roi", "sensor_msgs/msg/RegionOfInterest")],
}

_PRIM = {"i4": ("<i", 4), "u4": ("<I", 4), "f8": ("<d", 8),
         "u1": ("<B", 1)}


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0          # relative to after the encapsulation header

    def align(self, n: int) -> None:
        self.pos += (-self.pos) % n


def _decode_value(cur: _Cursor, typ) -> Any:
    if isinstance(typ, tuple):
        kind = typ[0]
        if kind == "seq":
            cur.align(4)
            n = struct.unpack_from("<I", cur.buf, cur.pos)[0]
            cur.pos += 4
            if typ[1] == "u1":          # fast path for byte blobs
                out = cur.buf[cur.pos:cur.pos + n]
                cur.pos += n
                return bytes(out)
            return [_decode_value(cur, typ[1]) for _ in range(n)]
        if kind == "arr":
            return [_decode_value(cur, typ[1]) for _ in range(typ[2])]
        raise ValueError(typ)
    if typ == "str":
        cur.align(4)
        n = struct.unpack_from("<I", cur.buf, cur.pos)[0]
        cur.pos += 4
        s = cur.buf[cur.pos:cur.pos + n - 1].decode("utf-8")
        cur.pos += n
        return s
    if typ in _PRIM:
        fmt, size = _PRIM[typ]
        cur.align(size)
        v = struct.unpack_from(fmt, cur.buf, cur.pos)[0]
        cur.pos += size
        return v
    return {name: _decode_value(cur, t) for name, t in SPECS[typ]}


def decode(data: bytes, type_name: str) -> dict:
    """CDR bytes -> nested dict for one of the SPECS types."""
    if len(data) < 4 or data[1] not in (0, 1):
        raise ValueError("bad CDR encapsulation header")
    if data[1] != 1:
        raise NotImplementedError("big-endian CDR not supported")
    cur = _Cursor(data[4:])
    return _decode_value(cur, type_name)


class _Writer:
    def __init__(self):
        self.parts = bytearray()

    def align(self, n: int) -> None:
        self.parts.extend(b"\x00" * ((-len(self.parts)) % n))


def _encode_value(w: _Writer, typ, val) -> None:
    if isinstance(typ, tuple):
        kind = typ[0]
        if kind == "seq":
            w.align(4)
            if typ[1] == "u1":
                b = bytes(val)
                w.parts.extend(struct.pack("<I", len(b)))
                w.parts.extend(b)
                return
            w.parts.extend(struct.pack("<I", len(val)))
            for v in val:
                _encode_value(w, typ[1], v)
            return
        if kind == "arr":
            assert len(val) == typ[2]
            for v in val:
                _encode_value(w, typ[1], v)
            return
        raise ValueError(typ)
    if typ == "str":
        w.align(4)
        b = str(val).encode("utf-8") + b"\x00"
        w.parts.extend(struct.pack("<I", len(b)))
        w.parts.extend(b)
        return
    if typ in _PRIM:
        fmt, size = _PRIM[typ]
        w.align(size)
        w.parts.extend(struct.pack(fmt, val))
        return
    for name, t in SPECS[typ]:
        _encode_value(w, t, val[name])


def encode(msg: dict, type_name: str) -> bytes:
    """Nested dict -> CDR bytes (little-endian encapsulation)."""
    w = _Writer()
    _encode_value(w, type_name, msg)
    return b"\x00\x01\x00\x00" + bytes(w.parts)


# --------------------------------------------------------------------------
# sqlite3 storage
# --------------------------------------------------------------------------


def read_bag(db3_path: str, topics: list[str] | None = None
             ) -> Iterator[tuple[str, str, int, bytes]]:
    """Yield (topic_name, type_name, timestamp_ns, cdr_bytes) in time
    order from a rosbag2 sqlite3 file."""
    con = sqlite3.connect(f"file:{db3_path}?mode=ro", uri=True)
    try:
        tmap = {tid: (name, typ) for tid, name, typ in con.execute(
            "SELECT id, name, type FROM topics")}
        q = ("SELECT topic_id, timestamp, data FROM messages "
             "ORDER BY timestamp")
        for topic_id, ts, data in con.execute(q):
            name, typ = tmap[topic_id]
            if topics is None or name in topics:
                yield name, typ, ts, data
    finally:
        con.close()


def write_bag(db3_path: str,
              messages: list[tuple[str, str, int, bytes]]) -> None:
    """Write (topic, type, timestamp_ns, cdr_bytes) records as a rosbag2
    sqlite3 file (schema compatible with rosbag2's SequentialReader)."""
    con = sqlite3.connect(db3_path)
    try:
        con.execute(
            "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT NOT "
            "NULL, type TEXT NOT NULL, serialization_format TEXT NOT "
            "NULL, offered_qos_profiles TEXT NOT NULL)")
        con.execute(
            "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id "
            "INTEGER NOT NULL, timestamp INTEGER NOT NULL, data BLOB "
            "NOT NULL)")
        ids: dict[str, int] = {}
        for topic, typ, _, _ in messages:
            if topic not in ids:
                ids[topic] = len(ids) + 1
                con.execute("INSERT INTO topics VALUES (?,?,?,?,?)",
                            (ids[topic], topic, typ, "cdr", ""))
        for i, (topic, _, ts, data) in enumerate(
                sorted(messages, key=lambda m: m[2])):
            con.execute("INSERT INTO messages VALUES (?,?,?,?)",
                        (i + 1, ids[topic], ts, data))
        con.commit()
    finally:
        con.close()


def stamp_to_sec(stamp: dict) -> float:
    return stamp["sec"] + stamp["nanosec"] * 1e-9


def make_stamp(t_sec: float) -> dict:
    sec = int(t_sec)
    return {"sec": sec, "nanosec": int(round((t_sec - sec) * 1e9))}
