"""Dataset IO tests: cams_meta.tsv format roundtrip, normalization,
batch sampling, inference params sidecar."""

import numpy as np

from f2nerf_tpu.data.dataset import load_dataset, save_dataset
from f2nerf_tpu.data.synthetic import make_sphere_dataset


def test_roundtrip(tmp_path, sphere_ds):
    save_dataset(sphere_ds, tmp_path)
    assert (tmp_path / "cams_meta.tsv").exists()
    ds = load_dataset(tmp_path)
    assert ds.n_images == sphere_ds.n_images
    assert ds.height == sphere_ds.height
    np.testing.assert_allclose(ds.poses, sphere_ds.poses, atol=1e-5)
    np.testing.assert_allclose(ds.intrinsics, sphere_ds.intrinsics,
                               rtol=1e-6)
    # images go through 8-bit PNG
    assert np.abs(ds.images - sphere_ds.images).max() < 1.0 / 255 + 1e-6
    np.testing.assert_allclose(ds.center, sphere_ds.center, atol=1e-4)
    np.testing.assert_allclose(ds.radius, sphere_ds.radius, rtol=1e-5)


def test_normalized_poses(sphere_ds):
    r = np.linalg.norm(sphere_ds.poses[:, :3, 3], axis=-1)
    assert abs(r.max() - 1.0) < 1e-5


def test_sample_batch(sphere_ds, rng):
    cam, ij, gt = sphere_ds.sample_batch(rng, 64)
    assert cam.shape == (64,) and ij.shape == (64, 2) and gt.shape == (64, 3)
    assert cam.min() >= 0 and cam.max() < sphere_ds.n_images
    # gt colors actually come from the images
    for k in range(8):
        np.testing.assert_allclose(
            gt[k], sphere_ds.images[cam[k], ij[k, 0], ij[k, 1]])


def test_inference_params(tmp_path, sphere_ds):
    sphere_ds.save_inference_params(tmp_path)
    text = (tmp_path / "inference_params.yaml").read_text()
    assert f"n_images: {sphere_ds.n_images}" in text
    assert "normalizing_radius" in text


def test_metrics():
    from f2nerf_tpu.utils.metrics import image_score, psnr, ssim
    a = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    assert ssim(a, a) > 0.99
    b = np.clip(a + 0.1, 0, 1)
    assert 15 < psnr(a, b) < 30
    assert image_score(a, b) > 0


def test_image_io_roundtrip(tmp_path, rng):
    from f2nerf_tpu.utils.image_io import read_image, resize_image, write_image
    img = rng.random((20, 24, 3)).astype(np.float32)
    write_image(tmp_path / "x.png", img)
    back = read_image(tmp_path / "x.png")
    assert back.shape == (20, 24, 3)
    assert np.abs(back - img).max() < 1.0 / 255 + 1e-6
    small = resize_image(img, 10, 12)
    assert small.shape == (10, 12, 3)


def test_checker_dataset():
    from f2nerf_tpu.data.synthetic import make_checker_dataset
    ds = make_checker_dataset(n_images=3, h=32, w=32)
    assert ds.images.shape == (3, 32, 32, 3)
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    # multi-object scene: views differ substantially
    assert np.abs(ds.images[0] - ds.images[1]).mean() > 0.02


def test_corridor_dataset():
    from f2nerf_tpu.data.synthetic import make_corridor_dataset
    ds = make_corridor_dataset(n_images=4, h=32, w=32)
    assert ds.images.shape == (4, 32, 32, 3)
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    # textured scene, every view has real content
    assert all(im.std() > 0.1 for im in ds.images)
    # free forward trajectory: camera centers span the path, normalized
    # to the unit ball, monotonic along the travel axis
    z = ds.poses[:, 2, 3]
    assert np.all(np.diff(z) > 0) and np.abs(z).max() <= 1.0 + 1e-5


def test_textured_dataset_aperiodic():
    """The round-4 aperiodic eval scene: no repeating texture — the
    floor's autocorrelation must fall off with lag (a periodic checker
    has near-1 peaks at multiples of its period)."""
    from f2nerf_tpu.data.synthetic import (_render_textured,
                                           make_textured_dataset)
    ds = make_textured_dataset(n_images=3, h=32, w=32)
    assert ds.images.shape == (3, 32, 32, 3)
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    assert all(im.std() > 0.05 for im in ds.images)
    # top-down orthographic-ish probe of the floor texture: sample the
    # color field along an x-line and check shifted self-similarity
    import numpy as np
    from f2nerf_tpu.data.synthetic import look_at_pose
    pose = look_at_pose(np.array([0.0, 2.5, 1e-4]), np.zeros(3))
    intr = np.array([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1.0]],
                    dtype=np.float32)
    img = _render_textured(pose, intr, 64, 64)
    row = img[40, :, 0] - img[40, :, 0].mean()
    ac = np.correlate(row, row, mode="full")[len(row) - 1:]
    ac = ac / (ac[0] + 1e-9)
    # the checker floor at this scale autocorrelates > 0.5 at its
    # period; the aperiodic floor must stay below
    assert np.abs(ac[8:]).max() < 0.8
    # determinism: two builds produce identical pixels
    ds2 = make_textured_dataset(n_images=3, h=32, w=32)
    np.testing.assert_array_equal(ds.images, ds2.images)


def test_longtraj_dataset():
    """The configs[3] stress scene (VERDICT r4 #3): a long winding free
    trajectory with aperiodic textures. Path must wind (lateral
    position is non-monotonic and spans real amplitude), content must
    exist in every view, and traced depth bounds must bracket the
    march."""
    from f2nerf_tpu.data.synthetic import make_longtraj_dataset
    ds = make_longtraj_dataset(n_images=8, h=32, w=32, length=40.0)
    assert ds.images.shape == (8, 32, 32, 3)
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    assert all(im.std() > 0.05 for im in ds.images)
    # travel axis is monotonic, normalized to the unit ball
    z = ds.poses[:, 2, 3]
    assert np.all(np.diff(z) > 0) and np.abs(z).max() <= 1.0 + 1e-5
    # the path winds: lateral (x) positions change sign / span widely
    x = ds.poses[:, 0, 3] * ds.radius
    assert x.max() - x.min() > 1.0
    # real traced near/far bounds per camera (world units)
    assert np.all(ds.bounds[:, 0] > 0.0)
    assert np.all(ds.bounds[:, 1] > ds.bounds[:, 0])
    # determinism
    ds2 = make_longtraj_dataset(n_images=8, h=32, w=32, length=40.0)
    np.testing.assert_array_equal(ds.images, ds2.images)


def test_objcap_dataset():
    """Inward 360-degree object capture (the ngp_fox-shaped proxy,
    BASELINE configs[0]): cameras must cover the full azimuth range at
    multiple elevations, all pointing inward at the object, with traced
    depth bounds that start at real object/ground content."""
    from f2nerf_tpu.data.synthetic import make_objcap_dataset
    ds = make_objcap_dataset(n_images=12, h=32, w=32)
    assert ds.images.shape == (12, 32, 32, 3)
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    assert all(im.std() > 0.05 for im in ds.images)
    pos = ds.poses[:, :, 3]
    # full-azimuth coverage: camera bearings land in all four quadrants
    az = np.arctan2(pos[:, 2], pos[:, 0])
    quads = set(((az + np.pi) // (np.pi / 2)).astype(int).tolist())
    assert len(quads) >= 4
    # multi-elevation: vertical positions span a real range
    assert pos[:, 1].max() - pos[:, 1].min() > 0.3
    # inward-facing: all view axes (-z, OpenGL) converge on a common
    # point — solve the least-squares ray intersection and check every
    # ray passes within 0.1 normalized units of it
    fwd = -ds.poses[:, :, 2]
    eye = np.eye(3)
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for p, f in zip(pos, fwd):
        m = eye - np.outer(f, f)
        A += m
        b += m @ p
    target = np.linalg.solve(A, b)
    rel = target - pos
    dist = np.linalg.norm(rel - np.sum(rel * fwd, -1, keepdims=True)
                          * fwd, axis=-1)
    assert np.all(dist < 0.1)
    # and the convergence point is in FRONT of every camera
    assert np.all(np.sum(rel * fwd, -1) > 0.5)
    # traced near bound sits at real content: closer than the camera
    # radius, farther than a third of it
    assert np.all(ds.bounds[:, 0] > 0.2)
    assert np.all(ds.bounds[:, 0] < 2.5)
    assert np.all(ds.bounds[:, 1] > ds.bounds[:, 0])
    # determinism
    ds2 = make_objcap_dataset(n_images=12, h=32, w=32)
    np.testing.assert_array_equal(ds.images, ds2.images)
