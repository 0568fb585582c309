"""Minimal COLMAP sparse-model reader (binary and text formats).

Replaces the reference's vendored 2,257-LoC pycolmap
(``scripts/pycolmap/``) with a compact reader for exactly what the
dataset pipeline needs: cameras, image poses, and 3D points with
visibility. Format per the COLMAP documentation.
"""

from __future__ import annotations

import dataclasses
import pathlib
import struct

import numpy as np

CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}
MODEL_IDS = {name: i for i, (name, _) in CAMERA_MODELS.items()}


@dataclasses.dataclass
class Camera:
    model: str
    width: int
    height: int
    params: np.ndarray  # model-specific

    @property
    def k(self) -> np.ndarray:
        p = self.params
        if self.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL",
                          "SIMPLE_RADIAL_FISHEYE"):
            fx = fy = p[0]
            cx, cy = p[1], p[2]
        else:
            fx, fy, cx, cy = p[0], p[1], p[2], p[3]
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                        dtype=np.float64)

    @property
    def dist(self) -> np.ndarray:
        """(k1, k2, p1, p2) best-effort per model."""
        p = self.params
        idx = {  # parameter indices of (k1, k2, p1, p2) per model
            "SIMPLE_RADIAL": (3, None, None, None),
            "RADIAL": (3, 4, None, None),
            "OPENCV": (4, 5, 6, 7),
            "OPENCV_FISHEYE": (4, 5, None, None),
            "FULL_OPENCV": (4, 5, 6, 7),
        }.get(self.model, (None,) * 4)
        return np.array([p[i] if i is not None else 0.0 for i in idx],
                        dtype=np.float64)


@dataclasses.dataclass
class Image:
    name: str
    camera_id: int
    qvec: np.ndarray     # (w, x, y, z)
    tvec: np.ndarray

    def rotation(self) -> np.ndarray:
        w, x, y, z = self.qvec / np.linalg.norm(self.qvec)
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)],
        ])

    def w2c(self) -> np.ndarray:
        m = np.eye(4)
        m[:3, :3] = self.rotation()
        m[:3, 3] = self.tvec
        return m


@dataclasses.dataclass
class Model:
    cameras: dict[int, Camera]
    images: dict[int, Image]
    points: np.ndarray            # [P, 3]
    point_image_ids: list[list[int]]  # per point: image ids seeing it


def _read(f, fmt):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def read_cameras_bin(path) -> dict[int, Camera]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cid, model_id, w, h = _read(f, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, f"<{n_params}d"))
            out[cid] = Camera(name, int(w), int(h), params)
    return out


def read_images_bin(path) -> dict[int, Image]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            iid = _read(f, "<i")[0]
            qvec = np.array(_read(f, "<4d"))
            tvec = np.array(_read(f, "<3d"))
            cam_id = _read(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(f, "<Q")
            f.read(24 * n_pts)  # skip 2D points (x, y, point3D_id)
            out[iid] = Image(name.decode(), cam_id, qvec, tvec)
    return out


def read_points3d_bin(path) -> tuple[np.ndarray, list[list[int]]]:
    pts, vis = [], []
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            _read(f, "<Q")  # point id
            xyz = _read(f, "<3d")
            f.read(3)       # rgb
            _read(f, "<d")  # error
            (track_len,) = _read(f, "<Q")
            track = _read(f, f"<{2 * track_len}i")
            pts.append(xyz)
            vis.append(list(track[0::2]))
    return np.array(pts), vis


def read_cameras_txt(path) -> dict[int, Camera]:
    out = {}
    for line in pathlib.Path(path).read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        tok = line.split()
        cid, model = int(tok[0]), tok[1]
        out[cid] = Camera(model, int(tok[2]), int(tok[3]),
                          np.array([float(t) for t in tok[4:]]))
    return out


def read_images_txt(path) -> dict[int, Image]:
    out = {}
    expecting_image = True
    for ln in pathlib.Path(path).read_text().splitlines():
        if ln.startswith("#"):
            continue
        if expecting_image:
            tok = ln.split()
            if len(tok) < 10:
                continue  # stray blank before an image line
            out[int(tok[0])] = Image(
                tok[9], int(tok[8]),
                np.array([float(t) for t in tok[1:5]]),
                np.array([float(t) for t in tok[5:8]]))
            expecting_image = False
        else:
            expecting_image = True  # consumed the (possibly empty) 2D row
    return out


def read_points3d_txt(path) -> tuple[np.ndarray, list[list[int]]]:
    pts, vis = [], []
    for line in pathlib.Path(path).read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        tok = line.split()
        pts.append([float(t) for t in tok[1:4]])
        vis.append([int(t) for t in tok[8::2]])
    return np.array(pts), vis


def load_model(model_dir: str | pathlib.Path) -> Model:
    d = pathlib.Path(model_dir)
    if (d / "cameras.bin").exists():
        cams = read_cameras_bin(d / "cameras.bin")
        imgs = read_images_bin(d / "images.bin")
        pts, vis = read_points3d_bin(d / "points3D.bin")
    elif (d / "cameras.txt").exists():
        cams = read_cameras_txt(d / "cameras.txt")
        imgs = read_images_txt(d / "images.txt")
        pts, vis = read_points3d_txt(d / "points3D.txt")
    else:
        raise FileNotFoundError(f"no COLMAP model in {d}")
    return Model(cameras=cams, images=imgs, points=pts,
                 point_image_ids=vis)


# -- writers (for tests / synthetic fixtures) ------------------------------
def write_model_txt(model: Model, out_dir: str | pathlib.Path) -> None:
    d = pathlib.Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "cameras.txt", "w") as f:
        for cid, c in model.cameras.items():
            params = " ".join(f"{p:.10g}" for p in c.params)
            f.write(f"{cid} {c.model} {c.width} {c.height} {params}\n")
    with open(d / "images.txt", "w") as f:
        for iid, im in model.images.items():
            q = " ".join(f"{v:.10g}" for v in im.qvec)
            t = " ".join(f"{v:.10g}" for v in im.tvec)
            f.write(f"{iid} {q} {t} {im.camera_id} {im.name}\n\n")
    with open(d / "points3D.txt", "w") as f:
        for i, (p, vis) in enumerate(zip(model.points,
                                         model.point_image_ids)):
            track = " ".join(f"{v} 0" for v in vis)
            f.write(f"{i + 1} {p[0]:.10g} {p[1]:.10g} {p[2]:.10g} "
                    f"0 0 0 0 {track}\n")
