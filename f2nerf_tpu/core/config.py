"""Configuration for training, model shape and rendering.

Mirrors the reference's two config sources with the reference values as
defaults:

* the training YAML (reference ``confs/train_config.yaml`` keys, parsed at
  ``src/main_functions/train_manager.cpp:25-44``), and
* the model hyper-parameters that the reference hard-codes as compile-time
  constants (``src/hash_3d_anchored.hpp:10-11`` N_LEVELS/N_CHANNELS,
  ``src/points_sampler.hpp:15,39`` MAX_SAMPLE_PER_RAY/SAMPLE_L,
  ``src/sh_shader.hpp:22`` DEGREE), promoted here to config fields per
  SURVEY.md §5.6.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any

import yaml


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model shape. Defaults replicate the reference exactly."""

    # Hash grid. The reference uses 16 levels x 2 channels
    # (src/hash_3d_anchored.hpp:10-11); the TPU-native default is
    # 8 levels x 4 channels — same total capacity and the same 32-wide
    # MLP input, but half the row fetches per point (the encode is
    # row-rate-bound on TPU, see ops/hash_paged.py). Set 16/2 to mirror
    # the reference exactly.
    n_levels: int = 8               # N_LEVELS
    n_channels: int = 4             # N_CHANNELS
    log2_table_size: int = 19       # pool_size = 2^19 * n_levels
    # 'paged' = TPU-native paged additive hash (ops/hash_paged.py, fast);
    # 'xor'   = reference-style per-corner XOR-prime hash (oracle path)
    hash_mode: str = "paged"
    init_seed: int = 2022           # numpy-side init (primes, page consts)
    # points per paged-encode chunk. 20480 measured optimal on the v5e
    # flagship (bench.py --encode_chunk sweep, round 4): 56.6k vs 52.5k
    # rays/s at 65536 — smaller chunks shrink the per-chunk VMEM
    # working set of the gather+trilinear stream and pipeline better;
    # below ~16k the per-chunk dispatch overhead wins again
    # (12288 -> 53.7k, 14336 -> 52.5k).
    encode_chunk: int = 20480
    # ray-coherent run-length dedup of coarse-level page fetches
    # (ops/hash_paged.py paged_encode_rays) — exact, pure perf
    encode_dedup: bool = True
    # dedup a level only while its worst-case run budget is at most this
    # fraction of samples/ray (the expansion matmuls are MXU-cheap —
    # ~0.5 ms against ~4 ms saved per level at 0.75 — but beyond this
    # the saved fetch fraction stops paying)
    dedup_max_frac: float = 0.75
    res_base_pow2: float = 3.0      # per-level res = exp2(3 + 7*l/15): 8..1024
    res_fine_pow2: float = 10.0
    contraction_radius: float = 1.0  # src/hash_3d_anchored.cpp:79
    hash_feat_dim: int = 16         # mlp_out_dim, src/hash_3d_anchored.cpp:61
    density_shift: float = 3.0      # DensityAct shift, src/renderer.cpp:55
    # input warp: 'contract' = radial contraction (what the mounted fork
    # uses); 'perspective' = F2-NeRF-style image-space-adaptive warp
    # (models/warp.py) built from the training cameras
    warp_mode: str = "contract"
    warp_n_regions: int = 64
    warp_n_cams: int = 4
    # smooth chart blending: a point's warp is the
    # softmax(-(d/sigma)^2)-weighted blend of its k nearest anchors'
    # charts (models/warp.py). 1 = hard nearest-anchor regions (the
    # original F2-NeRF octree-leaf behavior, discontinuous at
    # boundaries — measured 3.5 dB corridor train-fit cost, VERDICT r4
    # weak #1); the corridor A/B for the smooth default is in
    # BENCH_NOTES (round 5).
    warp_blend_k: int = 3

    # SH shader (reference src/sh_shader.{hpp,cpp})
    sh_degree: int = 4              # 16 coeffs
    shader_hidden_dim: int = 64
    app_emb_dim: int = 16           # app_emb [n_images, 16], src/renderer.cpp:28

    # Sampler (reference src/points_sampler.{hpp,cpp})
    n_samples: int = 1024           # MAX_SAMPLE_PER_RAY
    sample_l: float = 1.0 / 256.0   # SAMPLE_L
    # 'occ' = occupancy-guided sampling (models/occupancy.py, restores
    # the F2-NeRF/NGP occupancy grid the fork stripped — 8x fewer field
    # queries at the same fine spacing); 'dense' = reference-parity
    # uniform marcher.
    sampler_mode: str = "occ"
    # near-plane march offset: ray sampling starts at t = sample_near
    # instead of the camera pinhole. The reference marches from t ~ 0
    # (src/points_sampler.cpp:38-47) and ignores the cams_meta near/far
    # bounds entirely (src/dataset.cpp reads them but no sampler
    # consumes them); that works on its forward-trajectory captures,
    # where each camera's near shell is traversed by the cameras behind
    # it, but on inward-looking rings the shell in front of each camera
    # is seen by THAT CAMERA ALONE — a zero-multi-view-constraint zone
    # where SGD paints each train image onto a private near-field
    # billboard (perfect train PSNR, garbage from every novel pose; the
    # round-3 holdout autopsy, BENCH_NOTES.md). Units are normalized
    # scene units (cameras lie on the unit ball after
    # normalize_poses). 0 = reference parity. -1 = AUTO: derive from the
    # dataset's own near bounds (cams_meta col 25, the SfM
    # depth-percentile near that colmap2poses writes), normalized by the
    # scene radius — the Trainer resolves it at construction
    # (train/loop.py) so the jitted step still sees a static float.
    sample_near: float = 0.0
    # dense TRAIN: mirror the reference's two-pass early-stop
    # (renderer.cpp:58-88) with static shapes — a gradient-free full
    # march finds the survivor mask (transmittance > trans_eps), then
    # the differentiable pass runs on a CSR gather-compacted buffer
    # sized by the smallest total-survivor bucket in {RS/8, RS/4,
    # RS/2, RS} (lax.switch; all branches compile once). Outputs and
    # gradients equal the masked single pass (equivalence-tested).
    # Default OFF after on-TPU measurement (BENCH_NOTES r3 "Dense
    # two-pass", r5 "survivor-regime study"): it pays only when
    # survivors < ~20-25% of R*S — the break-even where pass 2's
    # savings beat pass 1's extra no-grad forward plus the
    # gather/scatter overheads. A young field pays pass 1 for nothing
    # (149 vs 112 ms/step at 61% survivors, r5), while at the
    # late-training regime (18% survivors) the round-5 machinery
    # (cumsum+scatter partition, flat pass-1 encode, survivor-stream
    # dedup below) measures 94.9 vs 112.2 ms — enable both flags for
    # long dense runs / scenes with fast-terminating rays, where the
    # few-k-step warmup penalty amortizes (~-8% wall on a 20k run).
    dense_two_pass: bool = False
    # Run-dedup over the two-pass COMPACTED survivor stream (round-5
    # dense follow-through): the compact branch keeps ray-major order,
    # so coarse levels still see long page runs. Certified budgets do
    # not survive compaction (prefix lengths have no lower bound), so
    # this path replaces them with a RUNTIME admissibility check — the
    # actual per-pseudo-row run counts are compared against heuristic
    # budgets and the encode falls back to the exact flat path inside
    # lax.cond whenever any level would overflow (hash_field
    # .query_compacted). Exact either way.
    dense_two_pass_dedup: bool = False
    occ_grid_res: int = 128
    occ_segments: int = 128
    # keep=8 with occ_trans_eps eligibility beats keep=16 without it on
    # both quality and speed (BENCH_NOTES.md: checker scene, PSNR 25.0
    # vs 20.2 @ 1k steps, 2.4x step rate) — the budget concentrates on
    # segments in front of / at the first surface
    occ_keep: int = 8
    occ_samples_per_segment: int = 8
    occ_update_every: int = 16
    occ_decay: float = 0.8
    # partial grid refresh: each refresh re-queries density at 1/K of
    # the cells (rotating strided subset; full turnover every K
    # refreshes) while decaying the whole max channel. A full-grid
    # refresh costs ~4x a train step at the flagship; K=4 cuts the
    # amortized overhead ~4x. 1 = full refresh every time.
    occ_refresh_phases: int = 4
    # while step < this, run the 1/K partial refresh K times as often
    # (same query rate as a full refresh, fresher in time) — the field
    # evolves fast early and a stale grid costs PSNR (measured -0.6 dB
    # @1.5k steps without it); after, drop to the slow cadence
    occ_refresh_warmup: int = 2048
    # a cell is occupied while its density-EMA's per-segment alpha
    # contribution 1-exp(-sigma*seg_len) exceeds this
    occ_thresh: float = 0.01
    # sample uniformly (grid forced occupied) for this many steps so the
    # field differentiates before pruning starts
    occ_warmup_steps: int = 512
    # transmittance-aware segment eligibility: skip segments whose
    # estimated transmittance (from the sigma-EMA grid) is below this.
    # Conservative vs trans_eps because the EMA overestimates sigma.
    # 0 disables (plain occupancy).
    occ_trans_eps: float = 1e-6
    # per-segment optical-depth cap for the eligibility estimate: one
    # segment multiplies T_est by at least exp(-cap), so cutting needs
    # ln(1/occ_trans_eps)/cap consecutive opaque segments — a single
    # exploded cell cannot starve a ray
    occ_elig_tau_cap: float = 4.6
    # EMA rate of the mean-sigma channel (eligibility estimate)
    occ_mean_ema: float = 0.25
    # exploration against the long-horizon density runaway (hash
    # collisions seed density in regions no ray samples; without
    # exploration that fog is never supervised, the sigma-EMA refresh
    # marks it opaque, the eligibility horizon creeps toward the camera,
    # and quality decays over long runs — measured 39 -> 24 PSNR between
    # 6k and 14k steps at 4096-ray batches, BENCH_NOTES.md).
    #
    # occ_explore_slots: in TRAIN, the last N keep-slots of EVERY ray
    # stratify over all occupied segments (not just the
    # transmittance-eligible ones) — each ray keeps keep-N slots of
    # surface budget while the batch collectively supervises the space
    # behind the estimated horizon. Preferred mechanism; 0 disables.
    occ_explore_slots: int = 1
    # target the explore slots at occupied-but-transmittance-ineligible
    # segments (the unsupervised set where collision fog grows) instead
    # of all occupied segments; falls back to all-occupied on rays with
    # no ineligible segment. See models/occupancy.py. Default True: the
    # untargeted variant FAILED the 20k horizon (once OCC ~ 1 the
    # explore samples land almost entirely in front of the horizon and
    # the fog region gets nothing — train PSNR 39.5 @4.9k -> ~16.5
    # @16k, BENCH_NOTES.md "20k-step flagship validation, round 2").
    occ_explore_targeted: bool = True
    # occ_explore_eps: alternatively, this fraction of rays ignores the
    # transmittance cut entirely. Measured worse than slot exploration
    # (whole-ray spread reconstructs the surface poorly and fights the
    # distortion loss at full ramp weight). 0 disables (default).
    occ_explore_eps: float = 0.0

    # Renderer
    trans_eps: float = 1e-4         # early-stop transmittance, src/renderer.cpp:65
    # store hash features in bfloat16 (the TPU analogue of the reference's
    # HALF_PRECISION fp16 pool, CMakeLists.txt:21); fp32 used for parity tests
    bf16_features: bool = True

    @property
    def table_size(self) -> int:
        # local_size = (pool//16)>>4<<4 — already 16-aligned for powers of two
        return (1 << self.log2_table_size)

    @property
    def pool_size(self) -> int:
        return self.table_size * self.n_levels

    @property
    def sh_dim(self) -> int:
        return self.sh_degree * self.sh_degree

    @property
    def shader_in_dim(self) -> int:
        return self.hash_feat_dim + self.sh_dim

    def level_resolutions(self) -> list[float]:
        """Per-level scale mul = exp2(base + (fine-base)*l/(L-1))."""
        span = self.res_fine_pow2 - self.res_base_pow2
        denom = max(self.n_levels - 1, 1)
        return [2.0 ** (self.res_base_pow2 + span * lvl / denom)
                for lvl in range(self.n_levels)]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop knobs (reference confs/train_config.yaml)."""

    pts_batch_size: int = 262144    # rays/step = (pts/512)>>4<<4 = 512
    end_iter: int = 20000
    report_freq: int = 200
    vis_freq: int = 2500
    save_freq: int = 20000
    learning_rate: float = 1e-2
    learning_rate_alpha: float = 1e-1
    learning_rate_warm_up_end_iter: int = 1000
    var_loss_weight: float = 1e-2
    var_loss_start: int = 5000
    var_loss_end: int = 10000
    # 'weight_var' = the reference's unnormalized weight variance
    # (CustomOps.cu:13-36); 'distortion' = normalized mip-NeRF-360-style
    # distortion (ops/composite.py::distortion_loss) — prefer on
    # unbounded / sky-heavy scenes where the reference loss erases far
    # content (BENCH_NOTES.md)
    var_loss_mode: str = "weight_var"
    # global-norm gradient clip; 0 disables (the reference has none)
    grad_clip_norm: float = 0.0
    # coupled weight decay on the hash feature pool; 0 = reference
    # behavior (no decay on the pool, hash_3d_anchored.cpp:93-101).
    # WARNING (measured, _runs/r2_q20k_wd): this decay feeds through
    # Adam's normalizer, so every row whose decay gradient dominates is
    # pulled at ~lr/step REGARDLESS of the decay value — at the
    # flagship (1e-2, lr 5e-3) the whole pool random-walks at ~lr
    # amplitude and training never leaves PSNR ~9. Prefer
    # explore_sparsity_weight, which supervises fog only where the
    # explore slots actually sample it.
    feat_pool_weight_decay: float = 0.0
    # explore-sparsity loss weight: mean log1p(sigma*dt) over samples in
    # occupied-but-transmittance-ineligible segments (the ones only
    # explore slots reach). The direct fix for the long-horizon
    # collision-fog runaway: color gradients cannot reach fog behind
    # the horizon (its transmittance contribution is ~0), so sampling
    # it is not enough — this term pushes its density down explicitly.
    # 0 disables (reference parity; the reference's dense march has no
    # unsupervised region).
    explore_sparsity_weight: float = 0.0
    # global density prior: each step, penalize log1p(sigma) at this
    # many uniform random points of the contracted domain (0 = off).
    # Rationale (round 3, _runs/r3_gen32_var0 autopsy): hash-collision
    # gradients write structured density garbage into space no training
    # ray ever traverses (e.g. the near-camera shell of a held-out ring
    # position — train rays march inward from their OWN positions), and
    # renders from novel poses look through that shell: holdout renders
    # scored ~10 dB off a 28-view model whose train views render at
    # 28-34 dB. The explore-sparsity term only supervises along train
    # rays; this weak volume-wide prior (the Plenoxels/DVGO sparsity
    # regularizer) reaches everywhere. ~0.4% step cost at 8192 points.
    global_sparsity_points: int = 8192
    global_sparsity_weight: float = 0.0
    # shard-count-invariant gradients: when > 0, the ray batch is split
    # into this many fixed blocks, per-block gradients are computed
    # independently (vmap), gathered to every device, and reduced in a
    # fixed [V, ...] order — parameter updates are then BITWISE
    # identical for any mesh size k with grad_blocks % k == 0 (the
    # balanced per-block grouping is independent of the physical shard
    # count, unlike psum partial sums whose grouping follows k). This
    # generalizes the reference's deterministic block-tiled ScatterAdd
    # backward (src/CustomOps/Scatter.cu:21-41) from one kernel to the
    # whole step. Costs one all-gather of V pool-sized gradient blocks
    # per step — an opt-in parity/verification mode, not the perf path.
    # 0 disables (default: grads are run-to-run deterministic at fixed
    # shard count; cross-shard-count drift is float-rounding only).
    grad_blocks: int = 0
    # static loss scaling: loss is multiplied by this before backward and
    # the gradients divided after, exactly like the reference's fp16
    # kernels' x128 scale (hash_3d_anchored.cu:190,200,214-215). bf16
    # keeps f32's exponent range so 1.0 (off) is numerically fine on
    # TPU; set 128.0 for grad-parity experiments against the fp16 CUDA
    # build. Powers of two are exact in floating point, so this is a
    # pure numerics-ordering knob, not an approximation.
    loss_scale: float = 1.0
    # occlusion regularizer (FreeNeRF-style): penalize the mean optical
    # depth sigma*dt of samples with t < occ_reg_t along every train
    # ray. Counter-pressure against near-camera "billboard"
    # memorization: on sparse-view rings SGD's cheapest solution paints
    # each train image onto private density right at the march start
    # (measured round 4: median TRAIN-view depth 0.33 with
    # sample_near=0.3 — the billboard simply re-formed at the new near
    # plane), and once transmittance collapses behind it the true
    # surface never receives gradients. A direct density penalty on the
    # near segment keeps that region transparent so gradients reach the
    # scene. 0 disables (reference parity — the reference has no such
    # term).
    occ_reg_weight: float = 0.0
    occ_reg_t: float = 0.0
    # coarse-to-fine level annealing: linearly unmask hash levels
    # coarse-first; level l's weight ramps over steps
    # [N*(l-1)/L, N*l/L] (level 0 fully on from step 0, all levels on
    # by N*(L-1)/L). The standard few-shot floater mitigation
    # (BARF / nerfstudio-style): early training cannot place
    # high-frequency content at wrong depths, so novel-view geometry
    # stays plausible. 0 = off (reference parity).
    level_anneal_end: int = 0
    # per-image appearance embedding in TRAIN renders (the reference
    # always adds it, src/renderer.cpp:100-104). False disables the
    # add: on appearance-CONSTANT captures (synthetic scenes, rigs with
    # locked exposure) the embedding acts as free per-view parameters
    # and memorizes ~3.6 dB of train-view signal the shared field then
    # never has to explain (round-5 own-emb measurement, BENCH_NOTES)
    # — signal that is lost to every novel view. Keep True for real
    # captures with exposure/white-balance drift (the embedding's
    # actual job).
    train_app_emb: bool = True
    # automatic NaN recovery: on a NaN loss, restore the newest finite
    # checkpoint and continue with a fresh host batch stream, up to this
    # many times per Trainer. 0 = reference behavior (CHECK-crash,
    # train_manager.cpp:98-100). The elastic-recovery story SURVEY §5.3
    # notes the reference lacks; long unattended runs set 2-3.
    nan_recovery: int = 0
    seed: int = 2022                # reference main.cpp:11
    ray_batch_size: int = 8192      # vis render chunk, train_manager.cpp:117

    @property
    def rays_per_step(self) -> int:
        # reference train_manager.cpp:69-70
        return (int(self.pts_batch_size / 512.0) >> 4) << 4


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    @staticmethod
    def tiny() -> "Config":
        """CPU-runnable tiny config (BASELINE.json configs[0]):
        4-level hash grid (2^14 table), 64 samples/ray."""
        return Config(
            model=ModelConfig(
                n_levels=4, log2_table_size=14, n_samples=64,
                sample_l=1.0 / 16.0, bf16_features=False,
                sampler_mode="dense"),
            train=TrainConfig(pts_batch_size=32768, end_iter=200,
                              report_freq=50, vis_freq=10**9,
                              save_freq=10**9,
                              learning_rate_warm_up_end_iter=20,
                              var_loss_start=50, var_loss_end=100),
        )

    @staticmethod
    def quality(end_iter: int = 20000) -> "Config":
        """Measured-best long-horizon quality operating point.

        The reference trains 512 rays/step at lr 1e-2
        (confs/train_config.yaml:4-7). On TPU the occupancy sampler
        sustains much larger batches; the validated settings at
        4096 rays/step are lr 5e-3 (1e-2 hits an edge-of-stability
        collapse ~4k steps at this batch size) and the normalized
        distortion loss at weight 1e-3 (the reference's unnormalized
        weight-variance at 1e-2 suppresses legitimately-spread geometry
        under occupancy sampling; measurements in BENCH_NOTES.md).

        The LR warmup scales with ``end_iter`` (at the reference's 20k
        it equals the reference's 1k warmup,
        confs/train_config.yaml:10-15).

        Distortion regularization (round-3/4 history): the r3 ramp at
        1e-3 over the middle half of the schedule was the measured
        trigger of a mid-training collapse (train EMA 27->15, fog
        re-inflates, _runs/r3_gen32) — but the collapse tracked the
        ramp's ONSET, not the loss: a constant 1e-4 from step 0 rides
        the full horizon with no collapse and identical quality
        (_runs/r4_tex_n06_dist), so that is what ships. Floater control
        under occupancy sampling is additionally carried by the
        explore-sparsity term.
        """
        return Config(
            # auto near bound (round 4): the march starts at the
            # dataset's own closest-content distance (SfM depth
            # percentile bounds / normalization radius, resolved by the
            # Trainer). The controlled 32-view A/B (BENCH_NOTES
            # "Round-4 generalization A/B matrix") shows this is the
            # single lever that breaks near-camera billboard
            # memorization on ring captures: checker holdout
            # 10.6 -> 20.5 dB, textured 18.3 -> 21.8, while coarse-to-
            # fine annealing and the occlusion regularizer each fail
            # alone. Forward trajectories resolve to a small near
            # (corridor: 0.13) so nothing is lost there.
            model=ModelConfig(sample_near=-1.0),
            train=TrainConfig(pts_batch_size=4096 * 512,
                              end_iter=end_iter,
                              learning_rate=5e-3,
                              learning_rate_warm_up_end_iter=max(
                                  end_iter // 20, 1),
                              var_loss_mode="distortion",
                              # constant small distortion from step 0
                              # (round 4): the r3 collapse tracked the
                              # RAMP's mid-training onset, not the loss
                              # itself — a constant 1e-4 rides the full
                              # horizon with no collapse and identical
                              # quality (r4_tex_n06_dist vs
                              # r4_tex_near06), restoring the
                              # reference's depth-regularizer
                              # capability (train_manager.cpp:80-93)
                              var_loss_weight=1e-4,
                              var_loss_start=0,
                              var_loss_end=1,
                              # anti-fog term: occupancy sampling only
                              # supervises sampled cells; hash
                              # collisions seed density behind the
                              # transmittance horizon where color
                              # gradients cannot reach, and it
                              # compounds (PSNR 39.5@5k -> 23@8k in the
                              # round-2 20k runs, with or without
                              # targeted exploration). The explore
                              # slots sample that region; this term
                              # supervises it down. (Pool weight decay
                              # was measured destructive instead — see
                              # feat_pool_weight_decay.)
                              explore_sparsity_weight=1e-2,
                              # long unattended runs ride through a
                              # stray NaN instead of dying (SURVEY §5.3)
                              nan_recovery=2),
        )

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "Config":
        model = ModelConfig(**d.get("model", {}))
        train = TrainConfig(**d.get("train", {}))
        return Config(model=model, train=train)

    @staticmethod
    def load(path: str | pathlib.Path) -> "Config":
        """Load a YAML config.

        Accepts both this framework's layout ({model: ..., train: ...}) and
        the reference's train_config.yaml layout ({train: {...}} with only
        training keys).
        """
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        train_d = dict(raw.get("train", {}))
        # drop reference keys we do not use (validate_freq is dead in the
        # reference too — parsed by no one, SURVEY.md §5.6)
        train_d.pop("validate_freq", None)
        known = {f.name for f in dataclasses.fields(TrainConfig)}
        train_d = {k: _coerce(v) for k, v in train_d.items() if k in known}
        model_d = dict(raw.get("model", {}))
        known_m = {f.name for f in dataclasses.fields(ModelConfig)}
        model_d = {k: _coerce(v) for k, v in model_d.items() if k in known_m}
        return Config(model=ModelConfig(**model_d), train=TrainConfig(**train_d))

    def save(self, path: str | pathlib.Path) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def _coerce(v: Any) -> Any:
    """YAML 1.1 parses 1e-2 as str in some loaders; coerce numeric strings."""
    if isinstance(v, str):
        try:
            return json.loads(v)
        except (ValueError, TypeError):
            try:
                return float(v)
            except ValueError:
                return v
    return v
