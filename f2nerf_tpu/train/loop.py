"""Training loop: driver around the jitted step.

Mirrors the reference TrainManager (src/main_functions/train_manager.cpp):
* train_log.txt lines ``Time / Iter / PSNR (EMA 0.9) / LOSS / LR`` every
  report_freq iters (:138-153),
* vis PNGs ``[gt | pred | depth]`` every vis_freq iters (:111-130),
* checkpoints every save_freq iters — but with optimizer state + step so
  training truly resumes (unlike the reference, SURVEY.md §5.4),
* config copied into the result dir so runs are self-describing
  (SURVEY.md §5.6).

Metrics are fetched from the device one report-interval behind the
current dispatch, so the host never blocks the TPU on ``.item()``-style
syncs (the reference forces a sync every iteration,
train_manager.cpp:95-100 — a perf hazard SURVEY.md §3.1 calls out).
"""

from __future__ import annotations

import math
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from f2nerf_tpu.core.config import Config
from f2nerf_tpu.data.dataset import Dataset
from f2nerf_tpu.models import renderer
from f2nerf_tpu.parallel import mesh as mesh_lib
from f2nerf_tpu.train import checkpoint as ckpt_lib
from f2nerf_tpu.train.optim import lr_schedule, make_optimizer
from f2nerf_tpu.train.step import make_train_step
from f2nerf_tpu.utils.image_io import write_image


class Trainer:
    def __init__(self, cfg: Config, dataset: Dataset,
                 result_dir: str | pathlib.Path | None = None,
                 encode_fn=None, use_mesh: bool = True,
                 profile_dir: str | pathlib.Path | None = None,
                 profile_steps: tuple[int, int] = (10, 15)):
        if cfg.model.sample_near < 0.0:
            # AUTO near bound (ModelConfig.sample_near = -1): the
            # dataset's smallest per-camera near bound in normalized
            # units. Real pipelines get these from SfM depth
            # percentiles (scripts/colmap2poses.py), making the march
            # start at the closest actual scene content — the
            # billboard-proof policy from the round-4 A/B
            # (BENCH_NOTES "Round-4 generalization A/B matrix").
            import dataclasses as _dc
            near = float(np.min(dataset.bounds[:, 0])
                         / max(dataset.radius, 1e-9))
            # Sanity-clamp (ADVICE r4): cameras lie on the unit ball
            # after normalization, so a resolved near beyond ~1.5 means
            # the cams_meta bounds are in units inconsistent with the
            # poses (or an outlier SfM near) — marching from there
            # would silently skip the whole scene.
            if near > 1.5:
                print(f"WARNING: auto sample_near resolved to {near:.3f}"
                      " (> 1.5 x scene radius — dataset bounds look"
                      " inconsistent with the normalized poses);"
                      " clamping to 1.5")
                near = 1.5
            print(f"auto sample_near resolved to {near:.4f} "
                  "(normalized units)")
            cfg = _dc.replace(cfg, model=_dc.replace(
                cfg.model, sample_near=near))
        self.cfg = cfg
        self.dataset = dataset
        self.result_dir = (pathlib.Path(result_dir)
                           if result_dir is not None else None)
        self.encode_fn = encode_fn
        # jax.profiler trace window (SURVEY §5.1: the TPU-native
        # replacement for the reference's ScopeWatch CUDA-sync scopes)
        self.profile_dir = (str(profile_dir) if profile_dir else None)
        self.profile_steps = profile_steps
        # cumulative training seconds across run() calls (in-process):
        # keeps the train_log "Time:" column monotonic when a driver
        # (quality_run) trains in short run() chunks, so per-tranche
        # times can be recovered as deltas (ADVICE r2 on
        # compare_time_to_psnr). Resets with the process; a clock
        # regression in the log marks a process/window boundary.
        self._elapsed_s = 0.0

        key = jax.random.key(cfg.train.seed)
        self.params, self.consts = renderer.init(
            key, cfg.model, dataset.n_images, np_seed=cfg.train.seed)
        if cfg.model.warp_mode == "perspective":
            from f2nerf_tpu.models.warp import build_warp
            tables = build_warp(dataset.poses, cfg.model)
            self.consts["field"]["warp_anchors"] = tables.anchors
            self.consts["field"]["warp_rows"] = tables.rows
        self.optimizer = make_optimizer(cfg.train)
        self.opt_state = self.optimizer.init(self.params)
        from f2nerf_tpu.models import occupancy
        self.occ_grid = occupancy.init_grid(cfg.model)
        self.step = 0

        self.mesh = mesh_lib.make_mesh() if use_mesh else None
        if self.mesh is not None:
            self.params = mesh_lib.replicate(self.mesh, self.params)
            self.consts = mesh_lib.replicate(self.mesh, self.consts)
            self.opt_state = mesh_lib.replicate(self.mesh, self.opt_state)
            self.occ_grid = mesh_lib.replicate(self.mesh, self.occ_grid)

        self.poses = jnp.asarray(dataset.poses)
        self.intrinsics = jnp.asarray(dataset.intrinsics)
        if self.mesh is not None:
            self.poses, self.intrinsics = (
                mesh_lib.replicate(self.mesh, self.poses),
                mesh_lib.replicate(self.mesh, self.intrinsics))

        self._step_fn = jax.jit(
            make_train_step(cfg, self.optimizer, encode_fn=encode_fn,
                            mesh=self.mesh),
            donate_argnums=(0, 1, 2))
        self._rng = np.random.default_rng(cfg.train.seed)
        # native prefetching batch loader (C++ worker threads) when built
        self._native = None
        try:
            from f2nerf_tpu.data.native_loader import (NativeBatchLoader,
                                                       available)
            if available():
                self._native = NativeBatchLoader(
                    dataset.images, cfg.train.rays_per_step,
                    seed=cfg.train.seed)
        except Exception:
            self._native = None
        self._lr = lr_schedule(cfg.train)
        self.psnr_smooth = -1.0
        self._nan_budget = cfg.train.nan_recovery

        if self.result_dir is not None:
            self.result_dir.mkdir(parents=True, exist_ok=True)
            cfg.save(self.result_dir / "train_config.yaml")
            dataset.save_inference_params(self.result_dir)
            self._log_file = open(self.result_dir / "train_log.txt", "a")
        else:
            self._log_file = None

    # -- checkpoint / resume ------------------------------------------------
    def save_checkpoint(self) -> None:
        if self.result_dir is None:
            return
        ckpt_lib.save(self.result_dir / "checkpoints", self.step,
                      self.params, self.opt_state, self.consts,
                      extra={"occ_grid": self.occ_grid})

    def _state_template(self) -> dict:
        return {"params": self.params, "opt_state": self.opt_state,
                "consts": self.consts, "step": 0,
                "extra": {"occ_grid": self.occ_grid}}

    def try_resume(self) -> bool:
        if self.result_dir is None:
            return False
        step = ckpt_lib.latest_step(self.result_dir / "checkpoints")
        if step is None:
            return False
        template = self._state_template()
        try:
            state = ckpt_lib.restore(self.result_dir / "checkpoints",
                                     template)
        except ValueError:
            # checkpoints written before the two-channel occupancy grid
            # store a [G,G,G] max-EMA only — retry with that shape
            template["extra"]["occ_grid"] = self.occ_grid[0]
            state = ckpt_lib.restore(self.result_dir / "checkpoints",
                                     template)
        self._adopt(state)
        return True

    def _adopt(self, state: dict) -> None:
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.consts = state["consts"]
        occ_grid = state["extra"]["occ_grid"]
        if occ_grid.ndim == 3:
            # legacy single-channel (max-EMA) grid: add an empty
            # mean-sigma eligibility channel (it re-learns within a few
            # occ refreshes; 0 = no eligibility cuts meanwhile)
            occ_grid = jnp.stack([occ_grid,
                                  jnp.zeros_like(occ_grid)])
        self.occ_grid = occ_grid
        if self.mesh is not None:
            # restore leaves arrays in default single-device placement;
            # re-replicate so the jitted step sees the same input
            # shardings it was compiled for at fresh init — otherwise
            # every resume recompiles the whole program (and misses the
            # persistent compilation cache: measured ~430 s per
            # quality_run window vs ~190 s cold)
            self.params = mesh_lib.replicate(self.mesh, self.params)
            self.opt_state = mesh_lib.replicate(self.mesh,
                                                self.opt_state)
            self.consts = mesh_lib.replicate(self.mesh, self.consts)
            self.occ_grid = mesh_lib.replicate(self.mesh, self.occ_grid)
        self.step = int(state["step"])

    def _recover(self) -> bool:
        """After a NaN loss: restore the newest checkpoint whose params
        are all-finite and continue on a fresh host batch stream.

        The elastic-recovery subsystem the reference lacks (SURVEY §5.3
        — its closest analogue is a CHECK-crash, train_manager.cpp:98-
        100). Checkpoints newer than NaN onset can themselves be
        poisoned (metrics are fetched one report interval behind the
        dispatch), so each candidate's params are validated before
        adoption; the batch RNG is re-derived so the failing ray
        sequence is not replayed (the device key is step-indexed, but
        every downstream draw differs with the batch).
        """
        if self.result_dir is None:
            return False
        d = self.result_dir / "checkpoints"
        steps = sorted((int(p.name.split("_")[1])
                        for p in d.glob("step_*") if p.is_dir()),
                       reverse=True) if d.exists() else []
        for s in steps:
            try:
                state = ckpt_lib.restore(d, self._state_template(),
                                         step=s)
            except Exception:
                continue
            # A checkpoint saved inside the NaN-detection lag window can
            # hold finite params but poisoned Adam moments or occ grid —
            # adopting it would immediately re-poison training and burn
            # a recovery slot (ADVICE r2). Validate every float leaf of
            # the full state, not just params.
            leaves = (jax.tree.leaves(state["params"])
                      + jax.tree.leaves(state["opt_state"])
                      + jax.tree.leaves(state["extra"]))
            if not all(bool(jnp.all(jnp.isfinite(x)))
                       for x in leaves
                       if hasattr(x, "dtype")
                       and jnp.issubdtype(x.dtype, jnp.floating)):
                continue
            self._adopt(state)
            self._rng = np.random.default_rng(
                int(self._rng.integers(1 << 63)))
            self.psnr_smooth = -1.0
            line = f"NAN-RECOVER: restored finite checkpoint step {s}"
            print(line)
            if self._log_file is not None:
                self._log_file.write(line + "\n")
                self._log_file.flush()
            return True
        return False

    # -- the loop -----------------------------------------------------------
    def run(self, n_steps: int | None = None) -> dict:
        """Train; on NaN, auto-recover up to cfg.train.nan_recovery
        times (0 = raise, the reference's behavior)."""
        end = (self.step + n_steps if n_steps is not None
               else self.cfg.train.end_iter)
        while True:
            try:
                return self._run_inner(end)
            except FloatingPointError:
                if self._nan_budget <= 0 or not self._recover():
                    raise
                self._nan_budget -= 1

    def _run_inner(self, end: int) -> dict:
        cfg = self.cfg
        batch = cfg.train.rays_per_step
        t0 = time.monotonic()
        pending: list[tuple[int, object]] = []
        last_metrics = None

        while self.step < end:
            if self.profile_dir is not None:
                if self.step == self.profile_steps[0]:
                    jax.profiler.start_trace(self.profile_dir)
                elif self.step == self.profile_steps[1]:
                    from f2nerf_tpu.utils.timer import device_sync
                    device_sync(self.params)
                    jax.profiler.stop_trace()
            if self._native is not None:
                cam_idx, ij, gt = self._native.next()
            else:
                cam_idx, ij, gt = self.dataset.sample_batch(
                    self._rng, batch)
            if self.mesh is not None:
                cam_idx, ij, gt = mesh_lib.shard_batch(
                    self.mesh, cam_idx, ij, gt)
            self.params, self.opt_state, self.occ_grid, metrics = \
                self._step_fn(
                    self.params, self.opt_state, self.occ_grid,
                    self.consts, self.poses, self.intrinsics,
                    jnp.asarray(self.step, jnp.int32), cam_idx, ij, gt)
            self.step += 1
            pending.append((self.step, metrics))

            if self.step % cfg.train.report_freq == 0:
                last_metrics = self._report(pending, t0)
                pending.clear()
            if self.step % cfg.train.vis_freq == 0:
                self._vis()
            if self.step % cfg.train.save_freq == 0:
                self.save_checkpoint()

        if pending:
            last_metrics = self._report(pending, t0)
        self._elapsed_s += time.monotonic() - t0
        return last_metrics or {}

    def _report(self, pending, t0) -> dict:
        # fetch all queued metrics at once (single device sync per report)
        fetched = jax.device_get([m for _, m in pending])
        for m in fetched:
            psnr = float(m.psnr)
            if math.isnan(float(m.mse)):
                raise FloatingPointError(
                    f"NaN loss at step {self.step}")  # ref CHECKs, :98-100
            self.psnr_smooth = (psnr if self.psnr_smooth < 0
                                else psnr * 0.1 + self.psnr_smooth * 0.9)
        last = fetched[-1]
        lr = float(self._lr(self.step))
        total = int(self._elapsed_s + time.monotonic() - t0)
        occ_part = ""
        if self.cfg.model.sampler_mode == "occ":
            # occupancy decision fraction per report: the pruning-health
            # curve (a fog-inflated field shows up here as ~1.0 long
            # before PSNR decays — BENCH_NOTES.md density runaway)
            from f2nerf_tpu.models import occupancy
            frac = float(jnp.mean(occupancy.occupancy_bits(
                self.occ_grid, self.cfg.model).astype(jnp.float32)))
            occ_part = f" OCC: {frac:.3f}"
        line = (f"Time: {total // 60:02d}:{total % 60:02d} "
                f"Iter: {self.step:6d} PSNR: {self.psnr_smooth:.6f} "
                f"LOSS: {float(last.color_loss):.6f} LR: {lr:.6f}"
                + occ_part)
        print(line)
        if self._log_file is not None:
            self._log_file.write(line + "\n")
            self._log_file.flush()
        return {"step": self.step, "psnr": self.psnr_smooth,
                "color_loss": float(last.color_loss), "lr": lr,
                "loss": float(last.loss)}

    def occ_bits(self):
        from f2nerf_tpu.models import occupancy
        if self.cfg.model.sampler_mode != "occ":
            return None
        return occupancy.occ_values(self.occ_grid, self.cfg.model,
                                    warmup=self.step < self.cfg.model.occ_warmup_steps)

    def _vis(self) -> None:
        if self.result_dir is None:
            return
        ds = self.dataset
        rgb, depth = renderer.render_image(
            self.params, self.consts, self.poses[0], self.intrinsics[0],
            ds.height, ds.width, self.cfg.model,
            chunk=self.cfg.train.ray_batch_size, encode_fn=self.encode_fn,
            occ_bits=self.occ_bits(), mesh=self.mesh)
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        depth3 = np.repeat(depth[..., None], 3, axis=-1)
        concat = np.concatenate([ds.images[0], rgb, depth3], axis=1)
        out = self.result_dir / "images"
        out.mkdir(exist_ok=True)
        write_image(out / f"{self.step:08d}_0.png", concat)
