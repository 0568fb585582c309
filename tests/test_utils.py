"""Utils tests: timers, undistortion, log parsing, inference analysis."""

import pathlib
import sys

import numpy as np

SCRIPTS = pathlib.Path(__file__).parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))


class TestTimer:
    def test_timer(self):
        from f2nerf_tpu.utils.timer import Timer
        t = Timer()
        assert t.elapsed_seconds() >= 0.0

    def test_scope_watch(self):
        from f2nerf_tpu.utils.timer import scope_watch
        lines = []
        with scope_watch("x", printer=lines.append):
            pass
        assert lines and lines[0].startswith("[x]")

    def test_step_timer(self):
        from f2nerf_tpu.utils.timer import StepTimer
        st = StepTimer()
        st.tic()
        st.toc()
        assert st.ema is not None and st.ema >= 0


class TestUndistort:
    def test_zero_distortion_identity(self, rng):
        from f2nerf_tpu.utils.undistort import undistort_image
        img = rng.random((24, 32, 3)).astype(np.float32)
        k = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]])
        out = undistort_image(img, k, np.zeros(4))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_radial_distortion_moves_pixels(self, rng):
        from f2nerf_tpu.utils.undistort import build_undistort_map
        k = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]])
        mi, mj = build_undistort_map(k, np.array([0.2, 0, 0, 0]), 24, 32)
        # center stays, corners move outward (sampling from larger r)
        assert abs(mi[12, 16] - 12 + 0.5) < 0.6
        assert mj[0, 0] < 0.0 or mi[0, 0] < 0.0  # pulled beyond corner


class TestLogParsing:
    def test_parse_train_log(self, tmp_path):
        from compare_train_result import parse_log
        log = ("Time: 00:05 Iter:    200 PSNR: 21.5 LOSS: 0.05 LR: 0.01\n"
               "Time: 00:09 Iter:    400 PSNR: 24.25 LOSS: 0.03 LR: 0.009\n")
        p = tmp_path / "train_log.txt"
        p.write_text(log)
        it, ps, lo = parse_log(p)
        np.testing.assert_array_equal(it, [200, 400])
        np.testing.assert_allclose(ps, [21.5, 24.25])

    def test_analyze_inference(self, tmp_path):
        from analyze_inference_result import analyze
        d = tmp_path / "0000"
        d.mkdir()
        rows = ["name\tx\ty\tz\tscore",
                "original\t0\t0\t0\t10",
                "noised_0\t1\t0\t0\t5",
                "optimized_0_00\t0.5\t0\t0\t7",
                "optimized_0_01\t0.2\t0\t0\t9"]
        (d / "position.tsv").write_text("\n".join(rows) + "\n")
        out = analyze(tmp_path)
        assert out["n_cases"] == 1
        np.testing.assert_allclose(out["mean_init_error"], 1.0)
        np.testing.assert_allclose(out["mean_final_error"], 0.2)
        assert out["recovered_fraction"] == 1.0
