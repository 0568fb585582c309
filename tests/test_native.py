"""Native (C++) prefetch loader tests. Builds the shared library on
demand (g++ is part of the toolchain); skips if the build fails."""

import pathlib
import subprocess

import numpy as np
import pytest

NATIVE_DIR = pathlib.Path(__file__).parent.parent / "native"


@pytest.fixture(scope="module")
def native_lib():
    lib = NATIVE_DIR / "libf2loader.so"
    if not lib.exists():
        try:
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build native loader: {e}")
    from f2nerf_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader unavailable")
    return native_loader


def test_gather_correct(native_lib, rng):
    imgs = rng.random((3, 16, 24, 3)).astype(np.float32)
    ld = native_lib.NativeBatchLoader(imgs, batch=512, seed=1)
    try:
        for _ in range(5):
            cam, ij, gt = ld.next()
            assert cam.shape == (512,)
            assert (cam >= 0).all() and (cam < 3).all()
            assert (ij[:, 0] < 16).all() and (ij[:, 1] < 24).all()
            np.testing.assert_array_equal(
                gt, imgs[cam, ij[:, 0], ij[:, 1]])
    finally:
        ld.close()


def test_deterministic_stream(native_lib, rng):
    imgs = rng.random((2, 8, 8, 3)).astype(np.float32)
    streams = []
    for n_threads in (1, 3):
        ld = native_lib.NativeBatchLoader(imgs, batch=256, seed=42,
                                          n_threads=n_threads)
        try:
            streams.append([ld.next() for _ in range(6)])
        finally:
            ld.close()
    for (c1, i1, g1), (c2, i2, g2) in zip(*streams):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(g1, g2)


def test_uniform_coverage(native_lib, rng):
    imgs = rng.random((5, 10, 10, 3)).astype(np.float32)
    ld = native_lib.NativeBatchLoader(imgs, batch=10000, seed=9)
    try:
        cam, ij, _ = ld.next()
        counts = np.bincount(cam, minlength=5)
        assert counts.min() > 1500  # ~2000 expected per image
        assert ij.min() >= 0
    finally:
        ld.close()


def test_trainer_uses_native(native_lib, tiny_cfg, sphere_ds):
    from f2nerf_tpu.train.loop import Trainer
    tr = Trainer(tiny_cfg, sphere_ds, result_dir=None)
    assert tr._native is not None
    m = tr.run(5)
    assert np.isfinite(m.get("loss", 0.0) if m else 0.0)
