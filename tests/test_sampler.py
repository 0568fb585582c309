"""Sampler tests: dense stratified marcher (reference
src/points_sampler.cpp) and occupancy-guided sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from f2nerf_tpu.core.config import ModelConfig
from f2nerf_tpu.models import occupancy
from f2nerf_tpu.models.sampler import sample_rays


class TestDenseSampler:
    def _cfg(self):
        return ModelConfig(n_samples=16, sample_l=1.0 / 8.0)

    def test_validate_uniform(self):
        cfg = self._cfg()
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0.0, 0.0, -2.0], [1.0, 0.0, 0.0]])
        s = sample_rays(o, d, cfg, key=None)
        # VALIDATE: noise = 1 -> t = (i+1) * SAMPLE_L
        expect_t = (np.arange(16) + 1) / 8.0
        np.testing.assert_allclose(s.t[0], expect_t, rtol=1e-6)
        # dirs normalized
        np.testing.assert_allclose(np.linalg.norm(s.dirs, axis=-1), 1.0,
                                   rtol=1e-6)
        # dt_0 = 0 (reference points_sampler.cpp:46-48)
        np.testing.assert_allclose(s.dt[:, 0], 0.0, atol=1e-7)
        np.testing.assert_allclose(s.dt[:, 1:], 1.0 / 8.0, rtol=1e-6)
        # points on the ray
        np.testing.assert_allclose(
            s.pts[0, 3], np.array([0, 0, -1.0]) * expect_t[3], atol=1e-6)

    def test_train_jitter_range(self):
        cfg = self._cfg()
        o = jnp.zeros((4, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
        s = sample_rays(o, d, cfg, key=jax.random.key(0))
        # each increment is in [0.5, 1.5) * SAMPLE_L
        inc = jnp.diff(s.t, axis=-1)
        assert float(inc.min()) >= 0.5 / 8.0 - 1e-6
        assert float(inc.max()) <= 1.5 / 8.0 + 1e-6
        # dt equals t increments
        np.testing.assert_allclose(s.dt[:, 1:], inc, rtol=1e-5)


class TestOccupancySampler:
    def _cfg(self):
        return ModelConfig(
            n_samples=32, sample_l=1.0 / 8.0, sampler_mode="occ",
            occ_grid_res=16, occ_segments=16, occ_keep=4,
            occ_samples_per_segment=2)

    def test_all_occupied_even_coverage(self):
        cfg = self._cfg()
        bits = jnp.ones(16 ** 3, bool)
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        s = occupancy.sample_rays_occ(o, d, bits, cfg, key=None)
        assert s.t.shape == (2, 8)
        assert bool(s.valid.all())
        # ranks (j+0.5)*16/4 -> segments 2, 6, 10, 14
        seg_len = 32 * (1 / 8.0) / 16
        seg_of = np.floor(np.asarray(s.t[0]) / seg_len).astype(int)
        np.testing.assert_array_equal(np.unique(seg_of), [2, 6, 10, 14])
        # t increasing
        assert bool((jnp.diff(s.t, axis=-1) > 0).all())

    def test_respects_occupancy(self):
        cfg = self._cfg()
        # occupy only a thin slab around z in [-1.25, -0.75]
        g = cfg.occ_grid_res
        grid = np.zeros((g, g, g), bool)
        zc = ((np.arange(g) + 0.5) * (4.0 / g)) - 2.0
        slab = (zc > -1.25) & (zc < -0.75)
        grid[:, :, slab] = True
        bits = jnp.asarray(grid.reshape(-1))
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0]])   # marches toward -z
        s = occupancy.sample_rays_occ(o, d, bits, cfg, key=None)
        pts_z = np.asarray(s.pts[0, :, 2])[np.asarray(s.valid[0])]
        assert pts_z.size > 0
        assert (pts_z > -1.3).all() and (pts_z < -0.7).all()

    def test_nothing_occupied_marks_invalid(self):
        cfg = self._cfg()
        bits = jnp.zeros(16 ** 3, bool)
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        s = occupancy.sample_rays_occ(o, d, bits, cfg, key=None)
        assert not bool(s.valid.any())
        np.testing.assert_allclose(s.dt, 0.0)

    def test_update_grid_and_threshold(self):
        cfg = self._cfg()
        grid = occupancy.init_grid(cfg)
        assert bool(occupancy.occupancy_bits(grid, cfg).all())
        # uniform (zero) density: the mean-clamped threshold keeps the
        # grid occupied — pruning a uniform field would be wrong
        for _ in range(30):
            grid = occupancy.update_grid(
                grid, lambda p: jnp.zeros(p.shape[0]),
                jax.random.key(0), cfg)
        assert bool(occupancy.occupancy_bits(grid, cfg).all())

    def test_phased_refresh_covers_grid(self):
        """K-phase partial refresh: after K rotated refreshes every cell
        has been re-queried; a K=1 refresh equals the original full
        update bit-for-bit."""
        import dataclasses
        cfg = self._cfg()
        cfg4 = dataclasses.replace(cfg, occ_refresh_phases=4)
        thresh = occupancy.sigma_threshold(cfg)

        def dens(p):  # dense near origin only
            return jnp.where(jnp.linalg.norm(p, axis=-1) < 0.5,
                             10.0 * thresh, 0.0)

        g1 = occupancy.update_grid(occupancy.init_grid(cfg), dens,
                                   jax.random.key(0), cfg, phase=0)
        g1b = occupancy.update_grid(occupancy.init_grid(cfg), dens,
                                    jax.random.key(0), cfg)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g1b))

        grid = occupancy.init_grid(cfg4)
        # mean channel starts 0; after a full rotation every cell inside
        # the dense ball must have a nonzero mean-EMA
        for ph in range(4):
            grid = occupancy.update_grid(grid, dens, jax.random.key(ph),
                                         cfg4, phase=ph)
        mean = np.asarray(grid[1]).reshape(-1)
        g = cfg.occ_grid_res
        ijk = np.stack(np.meshgrid(*([np.arange(g)] * 3),
                                   indexing="ij"), -1).reshape(-1, 3)
        centers = (ijk + 0.5) * (2 * occupancy.DOMAIN / g) \
            - occupancy.DOMAIN
        deep = np.linalg.norm(centers, axis=-1) < 0.35  # jitter-proof
        assert (mean[deep] > 0).all()
        # and 30 rotated refreshes keep dense regions / prune empties
        for i in range(30):
            grid = occupancy.update_grid(grid, dens, jax.random.key(i),
                                         cfg4, phase=i % 4)
        bits = np.asarray(occupancy.occupancy_bits(grid, cfg4)).reshape(
            g, g, g)
        assert bits[8, 8, 8]
        assert not bits[0, 0, 0]

    def test_update_keeps_dense_regions(self):
        cfg = self._cfg()
        grid = occupancy.init_grid(cfg)
        thresh = occupancy.sigma_threshold(cfg)

        def dens(p):  # dense near origin only
            return jnp.where(jnp.linalg.norm(p, axis=-1) < 0.5,
                             10.0 * thresh, 0.0)

        for i in range(30):
            grid = occupancy.update_grid(grid, dens,
                                         jax.random.key(i), cfg)
        bits = np.asarray(occupancy.occupancy_bits(grid, cfg)).reshape(
            16, 16, 16)
        assert bits[8, 8, 8]          # center occupied
        assert not bits[0, 0, 0]      # far corner pruned


class TestTransAwareEligibility:
    def _cfg(self, **kw):
        import dataclasses
        from f2nerf_tpu.core.config import ModelConfig
        return ModelConfig(
            n_levels=2, n_channels=2, log2_table_size=10,
            n_samples=32, sample_l=1.0 / 8.0, sampler_mode="occ",
            occ_grid_res=16, occ_segments=16, occ_keep=4,
            occ_samples_per_segment=2, **kw)

    def test_occ_values_zero_where_unoccupied(self):
        cfg = self._cfg()
        g = cfg.occ_grid_res
        thresh = occupancy.sigma_threshold(cfg)
        grid = occupancy.init_grid(cfg) * 0.0
        grid = grid.at[:, 0, 0, 0].set(100.0 * thresh)
        vals = np.asarray(occupancy.occ_values(grid, cfg))
        assert vals.shape == (2, g ** 3)
        assert vals[0, 0] > 0          # occupancy channel
        assert (vals[0, 1:] == 0).all()
        assert vals[1, 0] > 0          # mean-sigma eligibility channel
        # warmup forces everything occupied
        vals_w = np.asarray(occupancy.occ_values(grid, cfg, warmup=True))
        assert (vals_w[0] > 0).all()

    def test_opaque_slab_prunes_segments_behind(self):
        """With sigma-valued occupancy and occ_trans_eps, segments behind
        an estimated-opaque surface are ineligible, so the keep budget
        concentrates in front of / at the surface."""
        cfg = self._cfg(occ_trans_eps=1e-6)
        g = cfg.occ_grid_res
        grid = np.full((g, g, g), 1e5, np.float32)  # everything opaque
        vals = jnp.asarray(grid.reshape(-1))
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        s = occupancy.sample_rays_occ(o, d, vals, cfg, key=None)
        # with the per-segment tau cap, cutting needs
        # ln(1/eps)/tau_cap ~ 3 opaque segments of cumulative depth, so
        # the first ceil(13.8/4.6)+1 = 4 segments stay eligible and ALL
        # samples land there (no single-cell starvation)
        t_valid = np.asarray(s.t[0])[np.asarray(s.valid[0])]
        march = cfg.n_samples * cfg.sample_l
        seg_len = march / cfg.occ_segments
        n_elig = int(np.floor(np.log(1.0 / cfg.occ_trans_eps)
                              / cfg.occ_elig_tau_cap)) + 1
        assert (t_valid < n_elig * seg_len).all()
        assert t_valid.size > 0

    def test_explore_slots_bypass_transmittance_cut(self):
        """Exploration slots stratify over all occupied segments so
        regions behind the estimated-opaque horizon stay supervised
        (the long-horizon density runaway fix, BENCH_NOTES.md), while
        the other slots keep concentrating on the eligible prefix."""
        import jax
        cfg = self._cfg(occ_trans_eps=1e-6, occ_explore_slots=1,
                        occ_explore_eps=0.0)
        g = cfg.occ_grid_res
        grid = np.full((g, g, g), 1e5, np.float32)
        vals = jnp.asarray(grid.reshape(-1))
        o = jnp.zeros((8, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1))
        march = cfg.n_samples * cfg.sample_l
        seg_len = march / cfg.occ_segments
        n_elig = int(np.floor(np.log(1.0 / cfg.occ_trans_eps)
                              / cfg.occ_elig_tau_cap)) + 1

        s = occupancy.sample_rays_occ(o, d, vals, cfg,
                                      key=jax.random.key(0))
        sps = cfg.occ_samples_per_segment
        t = np.asarray(s.t).reshape(8, cfg.occ_keep, sps)
        valid = np.asarray(s.valid).reshape(8, cfg.occ_keep, sps)
        # base slots stay in the eligible prefix
        base = t[:, :cfg.occ_keep - 1][valid[:, :cfg.occ_keep - 1]]
        assert (base < n_elig * seg_len).all()
        # the exploration slot reaches beyond it for some rays
        exp = t[:, -1][valid[:, -1]]
        assert (exp > n_elig * seg_len).any()

        # VALIDATE (key=None): no exploration, deterministic renders
        sv = occupancy.sample_rays_occ(o, d, vals, cfg, key=None)
        tv = np.asarray(sv.t)[np.asarray(sv.valid)]
        assert (tv < n_elig * seg_len).all()

    def test_explore_slots_targeted_ineligible_only(self):
        """occ_explore_targeted=True: the explore slot stratifies over
        the occupied-but-ineligible set only — every explore sample
        lands BEHIND the transmittance horizon (where collision fog is
        otherwise never supervised), instead of mostly duplicating the
        base slots' eligible prefix."""
        import jax
        cfg = self._cfg(occ_trans_eps=1e-6, occ_explore_slots=1,
                        occ_explore_eps=0.0, occ_explore_targeted=True)
        g = cfg.occ_grid_res
        grid = np.full((g, g, g), 1e5, np.float32)
        vals = jnp.asarray(grid.reshape(-1))
        o = jnp.zeros((8, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1))
        march = cfg.n_samples * cfg.sample_l
        seg_len = march / cfg.occ_segments
        n_elig = int(np.floor(np.log(1.0 / cfg.occ_trans_eps)
                              / cfg.occ_elig_tau_cap)) + 1

        s = occupancy.sample_rays_occ(o, d, vals, cfg,
                                      key=jax.random.key(0))
        sps = cfg.occ_samples_per_segment
        t = np.asarray(s.t).reshape(8, cfg.occ_keep, sps)
        valid = np.asarray(s.valid).reshape(8, cfg.occ_keep, sps)
        base = t[:, :cfg.occ_keep - 1][valid[:, :cfg.occ_keep - 1]]
        assert (base < n_elig * seg_len).all()
        exp = t[:, -1][valid[:, -1]]
        assert exp.size > 0
        # EVERY explore sample is beyond the eligible prefix
        assert (exp >= n_elig * seg_len).all()

        # all-eligible fallback: no ineligible segments -> behaves like
        # the untargeted stratification over all occupied segments
        cfg2 = self._cfg(occ_trans_eps=0.0, occ_explore_slots=1,
                         occ_explore_targeted=True)
        s2 = occupancy.sample_rays_occ(o, d, vals, cfg2,
                                       key=jax.random.key(0))
        assert bool(np.asarray(s2.valid).any())

        # the explore flag marks exactly the ineligible-segment samples
        # (input to the explore-sparsity loss): true only beyond the
        # eligible prefix, and empty when everything is eligible
        ex = np.asarray(s.explore)
        tt, vv = np.asarray(s.t), np.asarray(s.valid)
        assert ex.any()
        assert (tt[ex] >= n_elig * seg_len).all()
        assert (ex <= vv).all()          # explore implies valid
        assert not np.asarray(s2.explore).any()

    def test_explore_rays_bypass_transmittance_cut(self):
        """occ_explore_eps rays ignore the estimated-opaque horizon so
        regions behind it stay supervised (the long-horizon density
        runaway fix, BENCH_NOTES.md)."""
        import jax
        cfg = self._cfg(occ_trans_eps=1e-6, occ_explore_eps=1.0,
                        occ_explore_slots=0)
        g = cfg.occ_grid_res
        grid = np.full((g, g, g), 1e5, np.float32)  # everything opaque
        vals = jnp.asarray(grid.reshape(-1))
        o = jnp.zeros((4, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (4, 1))
        march = cfg.n_samples * cfg.sample_l
        seg_len = march / cfg.occ_segments
        n_elig = int(np.floor(np.log(1.0 / cfg.occ_trans_eps)
                              / cfg.occ_elig_tau_cap)) + 1

        # eps=1: every (TRAIN) ray stratifies over the full march
        s = occupancy.sample_rays_occ(o, d, vals, cfg,
                                      key=jax.random.key(0))
        t_valid = np.asarray(s.t)[np.asarray(s.valid)]
        assert (t_valid > n_elig * seg_len).any()

        # eps=0: the cut applies to every ray
        cfg0 = self._cfg(occ_trans_eps=1e-6, occ_explore_eps=0.0,
                 occ_explore_slots=0)
        s0 = occupancy.sample_rays_occ(o, d, vals, cfg0,
                                       key=jax.random.key(0))
        t0 = np.asarray(s0.t)[np.asarray(s0.valid)]
        assert (t0 < n_elig * seg_len).all()

        # VALIDATE (key=None) never explores regardless of eps
        sv = occupancy.sample_rays_occ(o, d, vals, cfg, key=None)
        tv = np.asarray(sv.t)[np.asarray(sv.valid)]
        assert (tv < n_elig * seg_len).all()

    def test_eps_zero_matches_bool_bits(self, rng):
        """occ_trans_eps=0 with sigma values selects exactly the same
        segments as boolean bits."""
        cfg = self._cfg(occ_trans_eps=0.0)
        g = cfg.occ_grid_res
        occ = rng.random((g, g, g)) < 0.5
        sig = np.where(occ, 3.0, 0.0).astype(np.float32)
        o = jnp.asarray(rng.uniform(-0.2, 0.2, (8, 3)).astype(np.float32))
        d = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        a = occupancy.sample_rays_occ(o, d, jnp.asarray(occ.reshape(-1)),
                                      cfg, key=None)
        b = occupancy.sample_rays_occ(o, d, jnp.asarray(sig.reshape(-1)),
                                      cfg, key=None)
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))

    def test_grid_update_clamps_exploded_density(self):
        """An unbounded TruncExp density can return inf; the max-EMA
        must clamp it (inf * decay == inf would otherwise pin the cell
        opaque forever and, with occ_trans_eps, starve every ray behind
        it — the death spiral found in the 8k-step checker run)."""
        cfg = self._cfg(occ_trans_eps=1e-6)
        grid = occupancy.init_grid(cfg)

        def exploding(p):
            return jnp.full(p.shape[0], jnp.inf)

        grid = occupancy.update_grid(grid, exploding, jax.random.key(0),
                                     cfg)
        assert np.isfinite(np.asarray(grid)).all()
        assert float(grid.max()) <= occupancy.SIGMA_EMA_MAX
        # and it decays back below threshold once density normalizes
        for i in range(60):
            grid = occupancy.update_grid(
                grid, lambda p: jnp.zeros(p.shape[0]),
                jax.random.key(i), cfg)
        thr = occupancy.sigma_threshold(cfg)
        assert float(grid.max()) < thr

    def test_sampler_survives_inf_vals(self):
        """Legacy checkpoints may carry inf cells; the sampler must
        still produce finite eligibility."""
        cfg = self._cfg(occ_trans_eps=1e-6)
        g = cfg.occ_grid_res
        vals = jnp.full((g * g * g,), jnp.inf)
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        s = occupancy.sample_rays_occ(o, d, vals, cfg, key=None)
        assert bool(jnp.isfinite(s.pts).all())
        assert bool(s.valid[:, 0].all())   # first segment stays eligible


class TestSampleNear:
    """ModelConfig.sample_near shifts the march window [near, near+march)
    in both samplers (the billboard-shell fix, BENCH_NOTES round 4)."""

    def test_dense_near_offsets_t(self):
        cfg = ModelConfig(n_samples=16, sample_l=1.0 / 8.0,
                          sample_near=0.3)
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        s = sample_rays(o, d, cfg, key=None)
        expect_t = 0.3 + (np.arange(16) + 1) / 8.0
        np.testing.assert_allclose(s.t[0], expect_t, rtol=1e-6)
        # dt unchanged by the shift (dt_0 = 0 convention kept)
        np.testing.assert_allclose(s.dt[:, 0], 0.0, atol=1e-7)
        np.testing.assert_allclose(s.dt[:, 1:], 1.0 / 8.0, rtol=1e-6)
        # points on the ray at the shifted distances
        np.testing.assert_allclose(
            s.pts[0, 3], np.array([0, 0, -1.0]) * expect_t[3], atol=1e-6)

    def test_dense_near_train_min_t(self):
        cfg = ModelConfig(n_samples=16, sample_l=1.0 / 8.0,
                          sample_near=0.5)
        o = jnp.zeros((4, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
        s = sample_rays(o, d, cfg, key=jax.random.key(0))
        assert float(s.t.min()) >= 0.5 + 0.5 / 8.0 - 1e-6

    def test_occ_near_shifts_window(self):
        cfg = ModelConfig(
            n_samples=32, sample_l=1.0 / 8.0, sampler_mode="occ",
            occ_grid_res=16, occ_segments=16, occ_keep=4,
            occ_samples_per_segment=2, occ_trans_eps=0.0,
            sample_near=0.25)
        bits = jnp.ones(16 ** 3, bool)
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        s = occupancy.sample_rays_occ(o, d, bits, cfg, key=None)
        march = 32 / 8.0
        assert float(s.t.min()) >= 0.25
        assert float(s.t.max()) <= 0.25 + march
        # same window under TRAIN jitter
        s2 = occupancy.sample_rays_occ(o, d, bits, cfg,
                                       key=jax.random.key(1))
        assert float(s2.t.min()) >= 0.25
        assert float(s2.t.max()) <= 0.25 + march
        # points lie on the ray: pts = o + dirs * t
        np.testing.assert_allclose(
            np.asarray(s.pts),
            np.asarray(s.dirs)[:, None, :] * np.asarray(s.t)[..., None],
            atol=1e-5)

    def test_occ_near_zero_unchanged(self):
        kw = dict(n_samples=32, sample_l=1.0 / 8.0, sampler_mode="occ",
                  occ_grid_res=16, occ_segments=16, occ_keep=4,
                  occ_samples_per_segment=2)
        bits = jnp.ones(16 ** 3, bool)
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        a = occupancy.sample_rays_occ(o, d, bits, ModelConfig(**kw),
                                      key=None)
        b = occupancy.sample_rays_occ(
            o, d, bits, ModelConfig(**kw, sample_near=0.0), key=None)
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
