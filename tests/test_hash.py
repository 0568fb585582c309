"""Hash-grid encode tests: XOR (reference semantics) and paged (TPU
fast path) against numpy oracles; gradient and determinism checks."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from f2nerf_tpu.ops import hash_paged as hp
from f2nerf_tpu.ops.hash_encode import (hash_encode, init_primes,
                                        level_scales)


def _xor_oracle(points, feat, primes, biases, scales):
    """Reference Hash3DAnchoredForwardKernel (hash_3d_anchored.cu:61-93):
    per-corner XOR-prime hash + trilinear, float2uint saturation."""
    n = points.shape[0]
    n_lvl, tsize, c = feat.shape
    out = np.zeros((n, n_lvl, c), np.float32)
    for k in range(n):
        for lvl in range(n_lvl):
            pt = points[k] * scales[lvl] + biases[lvl]
            f = np.floor(pt)
            fr = pt - f
            ip = np.maximum(f, 0.0).astype(np.uint32)  # CUDA saturation
            acc = np.zeros(c, np.float32)
            for dx in range(2):
                for dy in range(2):
                    for dz in range(2):
                        cx = ip[0] + np.uint32(dx)
                        cy = ip[1] + np.uint32(dy)
                        cz = ip[2] + np.uint32(dz)
                        h = int((cx * primes[lvl, 0])
                                ^ (cy * primes[lvl, 1])
                                ^ (cz * primes[lvl, 2])) % tsize
                        w = ((fr[0] if dx else 1 - fr[0])
                             * (fr[1] if dy else 1 - fr[1])
                             * (fr[2] if dz else 1 - fr[2]))
                        acc += w * feat[lvl, h]
            out[k, lvl] = acc
    return out.reshape(n, n_lvl * c)


class TestXorHash:
    def _setup(self, rng, n_levels=2, tsize=256):
        scales = level_scales(n_levels, 1.0, 3.0)
        primes = init_primes(np.random.default_rng(0), n_levels)
        biases = rng.uniform(100, 1100, (n_levels, 3)).astype(np.float32)
        feat = rng.normal(size=(n_levels, tsize, 2)).astype(np.float32)
        pts = (rng.uniform(-1, 1, (32, 3)) * 1.9).astype(np.float32)
        return pts, feat, primes, biases, scales

    def test_matches_oracle(self, rng):
        pts, feat, primes, biases, scales = self._setup(rng)
        out = hash_encode(jnp.asarray(pts), jnp.asarray(feat),
                          jnp.asarray(primes), jnp.asarray(biases),
                          jnp.asarray(scales))
        expect = _xor_oracle(pts, feat, primes, biases, scales)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4,
                                   atol=1e-5)

    def test_gradients(self, rng):
        pts, feat, primes, biases, scales = self._setup(rng)
        pts_j = jnp.asarray(pts[:8])
        feat_j = jnp.asarray(feat)

        def f(feat_, pts_):
            return jnp.sum(jnp.sin(hash_encode(
                pts_, feat_, jnp.asarray(primes), jnp.asarray(biases),
                jnp.asarray(scales))))

        jax.test_util.check_grads(f, (feat_j, pts_j), order=1,
                                  modes=["rev"], atol=2e-2, rtol=2e-2)

    def test_grad_deterministic(self, rng):
        pts, feat, primes, biases, scales = self._setup(rng)
        g = jax.jit(jax.grad(lambda f_: jnp.sum(hash_encode(
            jnp.asarray(pts), f_, jnp.asarray(primes),
            jnp.asarray(biases), jnp.asarray(scales)))))
        a = np.asarray(g(jnp.asarray(feat)))
        b = np.asarray(g(jnp.asarray(feat)))
        assert np.array_equal(a, b)


def _paged_oracle(points, pages, meta):
    """Direct per-corner lookup with the additive page hash."""
    n = points.shape[0]
    ll = meta.n_levels
    c = meta.n_channels
    out = np.zeros((n, ll, c), np.float32)
    for k in range(n):
        for lvl in range(ll):
            pt = points[k] * meta.scales[lvl] + meta.biases[lvl]
            f = np.floor(pt).astype(np.int64)
            fr = pt - f
            acc = np.zeros(c, np.float32)
            for dx in range(2):
                for dy in range(2):
                    for dz in range(2):
                        cell = f + np.array([dx, dy, dz])
                        blk = cell >> 2
                        loc = cell & 3
                        p = int((np.uint32(blk[0]) * meta.a[lvl]
                                 + np.uint32(blk[1]) * meta.b[lvl]
                                 + np.uint32(blk[2]))
                                % np.uint32(meta.n_pages[lvl]))
                        w = ((fr[0] if dx else 1 - fr[0])
                             * (fr[1] if dy else 1 - fr[1])
                             * (fr[2] if dz else 1 - fr[2]))
                        acc += w * pages[meta.page_offset[lvl] + p, :,
                                         loc[0], loc[1], loc[2]]
            out[k, lvl] = acc
    return out.reshape(n, ll * c)


class TestPagedHash:
    def _setup(self, rng, n_levels=2, tsize=4096, c=2):
        scales = level_scales(n_levels, 1.0, 3.0)
        meta = hp.make_paged_meta(n_levels, tsize, c, scales, np_seed=0)
        pages = rng.normal(
            size=(meta.total_pages, c, 4, 4, 4)).astype(np.float32)
        pts = (rng.uniform(-1, 1, (48, 3)) * 1.95).astype(np.float32)
        return pts, pages, meta

    def test_matches_oracle(self, rng):
        pts, pages, meta = self._setup(rng)
        out = hp.paged_encode(jnp.asarray(pts), jnp.asarray(pages), meta,
                              compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out),
                                   _paged_oracle(pts, pages, meta),
                                   rtol=1e-4, atol=1e-5)

    def test_four_channels(self, rng):
        pts, pages, meta = self._setup(rng, n_levels=2, c=4)
        out = hp.paged_encode(jnp.asarray(pts), jnp.asarray(pages), meta,
                              compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out),
                                   _paged_oracle(pts, pages, meta),
                                   rtol=1e-4, atol=1e-5)

    def test_field_continuity_across_block_boundary(self, rng):
        """The halo must make the field continuous where trilinear
        corners straddle pages."""
        pts, pages, meta = self._setup(rng)
        # walk across a block boundary at the finest level
        eps = 1e-4
        base = np.array([[0.3, 0.11, -0.42]], dtype=np.float32)
        f = jnp.asarray
        for ax in range(3):
            lo = base.copy()
            hi = base.copy()
            lo[0, ax] -= eps
            hi[0, ax] += eps
            a = hp.paged_encode(f(lo), f(pages), meta,
                                compute_dtype=jnp.float32)
            b = hp.paged_encode(f(hi), f(pages), meta,
                                compute_dtype=jnp.float32)
            assert float(jnp.abs(a - b).max()) < 5e-2

    def test_gradients(self, rng):
        pts, pages, meta = self._setup(rng)
        pts_j = jnp.asarray(pts[:8])
        pages_j = jnp.asarray(pages)

        def f(pages_, pts_):
            return jnp.sum(jnp.sin(hp.paged_encode(
                pts_, pages_, meta, compute_dtype=jnp.float32)))

        jax.test_util.check_grads(f, (pages_j, pts_j), order=1,
                                  modes=["rev"], atol=2e-2, rtol=2e-2)

    def test_grad_deterministic(self, rng):
        pts, pages, meta = self._setup(rng)
        g = jax.jit(jax.grad(lambda p_: jnp.sum(hp.paged_encode(
            jnp.asarray(pts), p_, meta, compute_dtype=jnp.float32))))
        a = np.asarray(g(jnp.asarray(pages)))
        b = np.asarray(g(jnp.asarray(pages)))
        assert np.array_equal(a, b)

    def test_chunked_matches_single(self, rng):
        pts, pages, meta = self._setup(rng)
        a = hp.paged_encode(jnp.asarray(pts), jnp.asarray(pages), meta,
                            compute_dtype=jnp.float32, chunk=65536)
        b = hp.paged_encode(jnp.asarray(pts), jnp.asarray(pages), meta,
                            compute_dtype=jnp.float32, chunk=16)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)

    def test_capacity_matches_reference_scale(self):
        """Default config total params ~ reference 2^19*16*2 pool."""
        from f2nerf_tpu.core.config import ModelConfig
        from f2nerf_tpu.models.hash_field import paged_meta
        cfg = ModelConfig()
        meta = paged_meta(cfg)
        total = meta.total_pages * 64 * cfg.n_channels
        assert total >= 10_000_000  # same order as 16.8M reference


def _ray_points(rng, n_rays=12, n_samples=48, march=2.0, jitter=True,
                diag=False, invalid_suffix=False):
    """[R, S, 3] sample points along straight rays, t monotone (the
    sampler contract); optionally an occ-style invalid suffix that jumps
    back to t ~ 0."""
    o = rng.uniform(-0.4, 0.4, (n_rays, 3)).astype(np.float32)
    if diag:
        d = np.sign(rng.normal(size=(n_rays, 3))).astype(np.float32)
    else:
        d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    if jitter:
        noise = rng.uniform(0.5, 1.5, (n_rays, n_samples))
    else:
        noise = np.ones((n_rays, n_samples))
    t = np.cumsum(noise, axis=-1) * (march / n_samples)
    if invalid_suffix:
        t[:, -n_samples // 4:] = (np.arange(n_samples // 4)
                                  * march / n_samples / 4)[None]
    pts = o[:, None, :] + d[:, None, :] * t[..., None].astype(np.float32)
    return np.clip(pts, -1.98, 1.98).astype(np.float32)


class TestDedupEncode:
    """Run-length dedup (paged_encode_rays) must be bitwise-exact vs the
    flat path whenever the run budgets hold (they are proven bounds)."""

    def _setup(self, rng, n_levels=3, tsize=4096, c=2, march=2.0,
               n_samples=48):
        scales = level_scales(n_levels, 1.0, 4.0)   # 2 .. 16
        meta = hp.make_paged_meta(n_levels, tsize, c, scales, np_seed=0)
        pages = rng.normal(
            size=(meta.total_pages, c, 4, 4, 4)).astype(np.float32)
        budgets = hp.dedup_budgets(meta, n_samples, march, max_frac=1.0)
        assert any(budgets), "test setup must dedup at least one level"
        return pages, meta, budgets

    def _check_exact(self, pts, pages, meta, budgets):
        r, s = pts.shape[:2]
        a = hp.paged_encode_rays(jnp.asarray(pts), jnp.asarray(pages),
                                 meta, budgets,
                                 compute_dtype=jnp.float32)
        b = hp.paged_encode(jnp.asarray(pts).reshape(r * s, 3),
                            jnp.asarray(pages), meta,
                            compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(a).reshape(r * s, -1),
                                      np.asarray(b))

    def test_matches_flat_exact(self, rng):
        pages, meta, budgets = self._setup(rng)
        pts = _ray_points(rng)
        self._check_exact(pts, pages, meta, budgets)

    def test_adversarial_diagonal_rays(self, rng):
        pages, meta, budgets = self._setup(rng)
        pts = _ray_points(rng, diag=True)
        self._check_exact(pts, pages, meta, budgets)

    def test_occ_invalid_suffix(self, rng):
        pages, meta, budgets = self._setup(rng)
        pts = _ray_points(rng, invalid_suffix=True)
        self._check_exact(pts, pages, meta, budgets)

    def test_chunked_matches(self, rng):
        pages, meta, budgets = self._setup(rng)
        pts = _ray_points(rng, n_rays=10)
        a = hp.paged_encode_rays(jnp.asarray(pts), jnp.asarray(pages),
                                 meta, budgets,
                                 compute_dtype=jnp.float32)
        b = hp.paged_encode_rays(jnp.asarray(pts), jnp.asarray(pages),
                                 meta, budgets, chunk=96,
                                 compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_budget_bound_holds(self, rng):
        """Measured run counts stay within the proven budgets, even for
        worst-case diagonal rays."""
        pages, meta, budgets = self._setup(rng)
        pts = _ray_points(rng, n_rays=64, diag=True,
                          invalid_suffix=True)
        page_idx, _, _ = hp._page_indices(
            jnp.asarray(pts.reshape(-1, 3)), meta)
        page_idx = np.asarray(page_idx).reshape(64, 48, meta.n_levels)
        for lvl, b in enumerate(budgets):
            if not b:
                continue
            runs = 1 + (np.diff(page_idx[:, :, lvl], axis=1) != 0).sum(1)
            assert runs.max() <= b, (lvl, runs.max(), b)

    def test_grad_matches_flat(self, rng):
        pages, meta, budgets = self._setup(rng)
        pts = _ray_points(rng, n_rays=6, n_samples=24)
        r, s = pts.shape[:2]

        def f_dedup(p_):
            return jnp.sum(jnp.sin(hp.paged_encode_rays(
                jnp.asarray(pts), p_, meta, budgets,
                compute_dtype=jnp.float32)))

        def f_flat(p_):
            return jnp.sum(jnp.sin(hp.paged_encode(
                jnp.asarray(pts).reshape(r * s, 3), p_, meta,
                compute_dtype=jnp.float32)))

        ga = jax.grad(f_dedup)(jnp.asarray(pages))
        gb = jax.grad(f_flat)(jnp.asarray(pages))
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-5, atol=1e-6)

    def test_point_grads_false_matches(self, rng):
        """point_grads=False: identical forward and page gradients,
        zero point gradients (the train step's fast path)."""
        pages, meta, budgets = self._setup(rng)
        pts = jnp.asarray(_ray_points(rng, n_rays=6, n_samples=24))
        pages_j = jnp.asarray(pages)

        def f(p_, pts_, pg):
            return jnp.sum(jnp.sin(hp.paged_encode_rays(
                pts_, p_, meta, budgets, compute_dtype=jnp.float32,
                point_grads=pg)))

        np.testing.assert_array_equal(
            np.asarray(f(pages_j, pts, False)),
            np.asarray(f(pages_j, pts, True)))
        g_page_f, g_pts_f = jax.grad(f, argnums=(0, 1))(pages_j, pts,
                                                        False)
        g_page_t, g_pts_t = jax.grad(f, argnums=(0, 1))(pages_j, pts,
                                                        True)
        np.testing.assert_array_equal(np.asarray(g_page_f),
                                      np.asarray(g_page_t))
        np.testing.assert_array_equal(np.asarray(g_pts_f), 0.0)
        assert float(jnp.abs(g_pts_t).max()) > 0.0

    def test_point_gradients(self, rng):
        """d_points flows through the dedup path (pose optimization)."""
        pages, meta, budgets = self._setup(rng)
        pts = jnp.asarray(_ray_points(rng, n_rays=4, n_samples=24))
        pages_j = jnp.asarray(pages)

        def f(pts_):
            return jnp.sum(jnp.sin(hp.paged_encode_rays(
                pts_, pages_j, meta, budgets,
                compute_dtype=jnp.float32)))

        jax.test_util.check_grads(f, (pts,), order=1, modes=["rev"],
                                  atol=2e-2, rtol=2e-2)

    def _occ_points(self, rng, n_rays, keep, sps, n_seg, march,
                    diag=False, invalid_tail=0):
        """Occ-sampler-structured points: keep slots of sps samples,
        ascending segment indices, stratified within; optional invalid
        suffix slots re-walking segment 0 (models/occupancy.py:229-242)."""
        seg_len = march / n_seg
        o = rng.uniform(-0.4, 0.4, (n_rays, 3)).astype(np.float32)
        if diag:
            d = np.sign(rng.normal(size=(n_rays, 3))).astype(np.float32)
        else:
            d = rng.normal(size=(n_rays, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        seg_idx = np.sort(
            rng.choice(n_seg, size=(n_rays, keep), replace=True), axis=1)
        if invalid_tail:
            seg_idx[:, -invalid_tail:] = 0
        u = rng.uniform(0, 1, (n_rays, keep, sps))
        t = (seg_idx[..., None] * seg_len
             + (np.arange(sps)[None, None, :] + u) * (seg_len / sps))
        t = t.reshape(n_rays, keep * sps).astype(np.float32)
        pts = o[:, None, :] + d[:, None, :] * t[..., None]
        return np.clip(pts, -1.98, 1.98).astype(np.float32)

    def test_occ_budget_bound_holds(self, rng):
        """The occ-slot run bound must hold for occ-structured points,
        including adversarial diagonals and invalid-suffix slots."""
        keep, sps, n_seg, march = 4, 8, 16, 2.0
        pages, meta, _ = self._setup(rng, n_samples=keep * sps)
        budgets = hp.dedup_budgets(meta, keep * sps, march, max_frac=1.0,
                                   occ=(keep, sps, n_seg))
        assert any(budgets)
        for diag in (False, True):
            for tail in (0, 2):
                pts = self._occ_points(rng, 64, keep, sps, n_seg, march,
                                       diag=diag, invalid_tail=tail)
                page_idx, _, _ = hp._page_indices(
                    jnp.asarray(pts.reshape(-1, 3)), meta)
                pi = np.asarray(page_idx).reshape(64, keep * sps,
                                                  meta.n_levels)
                for lvl, b in enumerate(budgets):
                    if not b:
                        continue
                    runs = 1 + (np.diff(pi[:, :, lvl], axis=1) != 0).sum(1)
                    assert runs.max() <= b, (lvl, runs.max(), b)

    def test_occ_budgets_exact(self, rng):
        keep, sps, n_seg, march = 4, 8, 16, 2.0
        pages, meta, _ = self._setup(rng, n_samples=keep * sps)
        budgets = hp.dedup_budgets(meta, keep * sps, march, max_frac=1.0,
                                   occ=(keep, sps, n_seg))
        pts = self._occ_points(rng, 16, keep, sps, n_seg, march,
                               invalid_tail=1)
        self._check_exact(pts, pages, meta, budgets)

    def test_occ_budget_tighter_than_march(self, rng):
        """Mid levels must gain dedup from the occ-slot bound (the point
        of the occ-aware formula)."""
        from f2nerf_tpu.core.config import ModelConfig
        from f2nerf_tpu.models.hash_field import paged_meta
        cfg = ModelConfig()          # flagship occ config
        meta = paged_meta(cfg)
        s = cfg.occ_keep * cfg.occ_samples_per_segment
        march = cfg.n_samples * cfg.sample_l
        b_march = hp.dedup_budgets(meta, s, march, cfg.dedup_max_frac)
        b_occ = hp.dedup_budgets(
            meta, s, march, cfg.dedup_max_frac,
            occ=(cfg.occ_keep, cfg.occ_samples_per_segment,
                 cfg.occ_segments))
        assert sum(1 for b in b_occ if b) > sum(1 for b in b_march if b)

    def test_budget_helper_disables_fine_levels(self):
        from f2nerf_tpu.core.config import ModelConfig
        from f2nerf_tpu.models.hash_field import paged_meta, ray_budgets
        cfg = ModelConfig()          # flagship occ config
        budgets = ray_budgets(cfg)
        assert budgets is not None
        assert budgets[0] > 0        # coarsest level dedups
        assert budgets[-1] == 0      # finest level does not
        s = cfg.occ_keep * cfg.occ_samples_per_segment
        assert all(b <= cfg.dedup_max_frac * s for b in budgets)


@pytest.mark.slow
def test_compute_runs_binary_search_equivalence():
    """The binary-search run-page lookup must match the (correct-by-
    construction) dense where+max formulation on every used run slot,
    under production fill semantics (fill = the level's minimum page
    index). Randomized run structures, budgets >= true run counts."""
    import jax
    import jax.numpy as jnp

    from f2nerf_tpu.ops.hash_paged import compute_runs

    rng = np.random.default_rng(7)
    for _ in range(8):
        r, s = int(rng.integers(2, 10)), int(rng.integers(8, 80))
        base = rng.integers(0, 7, (r, s)).astype(np.int32)
        runs = np.cumsum(rng.random((r, s)) < rng.random(),
                         axis=1).astype(np.int32)
        pages = (base + 13 * runs) % 997
        b = int(1 + (pages[:, 1:] != pages[:, :-1]).sum(axis=1).max()
                + rng.integers(1, 4))
        fill = int(pages.min())
        pi = jnp.asarray(pages)
        rid, rp = compute_runs(pi, b, fill)
        rid, rp = np.asarray(rid), np.asarray(rp)
        # oracle: page of each run's first sample, per ray
        for ray in range(r):
            for bb in np.unique(rid[ray]):
                first = int(np.argmax(rid[ray] == bb))
                assert rp[ray, bb] == pages[ray, first], (ray, bb)


class TestQueryCompacted:
    """Survivor-stream dedup (hash_field.query_compacted): runtime-
    checked run budgets over pseudo-rows of the compacted two-pass
    stream, exact flat fallback on overflow — results must equal the
    plain flat query either way (VERDICT r4 #5)."""

    def _cfg(self):
        from f2nerf_tpu.core.config import ModelConfig
        return ModelConfig(n_levels=4, n_channels=2, log2_table_size=10,
                           n_samples=256, sample_l=1.0 / 64.0,
                           bf16_features=False, sampler_mode="dense",
                           encode_chunk=65536)

    def test_budgets_exist_at_dense_shape(self):
        from f2nerf_tpu.models.hash_field import compacted_budgets
        cfg = self._cfg()
        b = compacted_budgets(cfg, cfg.n_samples)
        assert b is not None and any(b)

    def test_coherent_stream_matches_flat_query(self):
        """Ray-coherent stream (what the compact branch produces): the
        runtime check passes, the dedup branch runs, results and
        gradients equal the flat query."""
        import dataclasses

        from f2nerf_tpu.models import hash_field, renderer, sampler
        from f2nerf_tpu.ops.contraction import contract

        cfg = self._cfg()
        rng = np.random.default_rng(5)
        params, consts = renderer.init(jax.random.key(1), cfg, 2)
        o = jnp.asarray(rng.standard_normal((4, 3)) * 0.2, jnp.float32)
        d = rng.standard_normal((4, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                        jnp.float32)
        smp = sampler.sample_rays(o, d, cfg, jax.random.key(2))
        pts = smp.pts.reshape(-1, 3)                 # ray-major stream

        # the runtime admissibility check must PASS here (otherwise
        # this test only exercises the fallback): recompute it exactly
        budgets = hash_field.compacted_budgets(cfg, cfg.n_samples)
        x = contract(pts, cfg.contraction_radius)
        page_idx, _, _ = hp._page_indices_lm(x, hash_field.paged_meta(cfg))
        r2 = pts.shape[0] // cfg.n_samples
        for lvl, b in enumerate(budgets):
            if not b:
                continue
            pl = np.asarray(page_idx[lvl]).reshape(r2, cfg.n_samples)
            runs = 1 + (pl[:, 1:] != pl[:, :-1]).sum(1)
            assert runs.max() <= b, f"level {lvl} check must pass"

        def f_comp(p):
            return hash_field.query_compacted(p, consts["field"], pts,
                                              cfg)

        def f_flat(p):
            return hash_field.query(p, consts["field"], pts, cfg)

        fc = jax.jit(f_comp)(params["field"])
        ff = jax.jit(f_flat)(params["field"])
        np.testing.assert_allclose(fc, ff, rtol=1e-6, atol=1e-7)

        gc = jax.jit(jax.grad(lambda p: jnp.sum(jnp.sin(f_comp(p)))))(
            params["field"])
        gf = jax.jit(jax.grad(lambda p: jnp.sum(jnp.sin(f_flat(p)))))(
            params["field"])
        for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gf)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    def test_scrambled_stream_falls_back_exactly(self):
        """Adversarial stream (random point order): run counts explode,
        the runtime check fails, and the flat fallback keeps results
        exact — the overflow never silently clamps."""
        from f2nerf_tpu.models import hash_field, renderer

        cfg = self._cfg()
        rng = np.random.default_rng(7)
        params, consts = renderer.init(jax.random.key(1), cfg, 2)
        pts = jnp.asarray(rng.standard_normal((2 * cfg.n_samples, 3)),
                          jnp.float32)

        fc = jax.jit(lambda p: hash_field.query_compacted(
            p, consts["field"], pts, cfg))(params["field"])
        ff = jax.jit(lambda p: hash_field.query(
            p, consts["field"], pts, cfg))(params["field"])
        np.testing.assert_allclose(fc, ff, rtol=1e-6, atol=1e-7)
