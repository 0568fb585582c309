"""Benchmark: training-step throughput (rays/s/chip, fwd+bwd) on the
flagship F2-NeRF operating point (512 rays x 1024 samples/ray, 16-level
2^19 hash grid — reference envelope, BASELINE.md).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is the F2-NeRF paper's implied training throughput on an RTX
2080Ti (~20k steps x 512 rays in ~12 min ≈ 14.2k rays/s), the only
external anchor available.

Hardening (round 2 shipped rc=124 with no JSON — VERDICT r2 weak #1):
- a watchdog thread armed BEFORE the first jax device touch prints a
  best-effort JSON line if the run exceeds BENCH_BUDGET_S (default 480s,
  override via env) — a wedged TPU tunnel or slow compile can no longer
  zero out the round's artifact;
- measurement is chunked: after each ~5-iter chunk the shared
  best-so-far throughput is updated, so the watchdog always has the
  freshest real number;
- every successful run caches its result in BENCH_SELF.json next to
  this file; if the watchdog fires before ANY measurement completed
  (tunnel wedged pre-compile), it falls back to that in-round cache and
  says so in the unit string (honest provenance, not a silent echo);
- the persistent XLA compilation cache is enabled so a bench run in the
  same machine session (e.g. the driver's end-of-round run after an
  in-round warmup run) skips the cold compile.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import threading
import time

REFERENCE_RAYS_PER_S = 14200.0  # F2-NeRF paper, RTX 2080Ti (see docstring)
SELF_CACHE = pathlib.Path(__file__).resolve().parent / "BENCH_SELF.json"

def _git_sha() -> str | None:
    """HEAD sha, suffixed with a working-tree diff hash when dirty.

    A dirty tree shares HEAD with the commit it diverged from, so a
    bare-sha cache key would replay a number measured on different code
    (ADVICE r4). Keying on sha+diff-hash makes the cached fallback
    valid only for the exact source state it was measured at.
    """
    try:
        import hashlib
        import subprocess
        sha = subprocess.run(
            ["git", "-C", str(SELF_CACHE.parent), "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
        if sha is None:
            return None
        diff = subprocess.run(
            ["git", "-C", str(SELF_CACHE.parent), "diff", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout
        if diff:
            sha += "+dirty:" + hashlib.sha256(diff.encode()).hexdigest()[:12]
        return sha
    except Exception:
        return None


_emit_lock = threading.Lock()
_emitted = False
_best = {"value": None, "unit": None, "iters_done": 0}
# arm key of THIS invocation (set in main before any device touch):
# the cached fallback must never replay a different arm's number
_arm = {"key": None}


def _emit(value: float, unit: str) -> None:
    """Print the one JSON result line exactly once, process-wide."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
        print(json.dumps({
            "metric": "train_rays_per_s_per_chip",
            "value": round(float(value), 1),
            "unit": unit,
            "vs_baseline": round(float(value) / REFERENCE_RAYS_PER_S, 3),
        }), flush=True)


def _watchdog(budget_s: float) -> None:
    """Emit whatever we have when the budget expires, then hard-exit.

    os._exit is deliberate: a wedged PJRT client blocks in C++ and
    ignores normal interpreter shutdown; exiting 0 after printing keeps
    the driver artifact parseable (rc=124 with no output is the failure
    mode this guards against)."""
    time.sleep(budget_s)
    if _best["value"] is not None:
        _emit(_best["value"],
              _best["unit"] + f", watchdog emit after {_best['iters_done']}"
              f" iters at {budget_s:.0f}s budget")
    else:
        cached = None
        try:
            cached = json.loads(SELF_CACHE.read_text())
            # refuse a cache written at a different commit OR for a
            # different bench arm: the fallback exists to survive a
            # wedged tunnel WITHIN a round, not to replay an old
            # build's (or another operating point's) number (ADVICE r3
            # + round-4 review). A None sha on either side refuses too.
            sha = _git_sha()
            if (sha is None or cached.get("git_sha") != sha
                    or cached.get("arm") != _arm["key"]):
                cached = None
        except Exception:
            pass
        if cached:
            _emit(cached["value"],
                  cached["unit"] + " [CACHED in-round result: this "
                  "driver-run invocation hit the time budget before "
                  "measuring; see BENCH_NOTES.md]")
        else:
            _emit(0.0, "rays/s/chip [bench run exceeded budget before "
                       "any measurement completed]")
    os._exit(0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny config, few iters (CI smoke)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rays", type=int, default=None,
                    help="override rays/step")
    ap.add_argument("--dense", action="store_true",
                    help="reference-parity operating point: dense "
                         "sampler, 512 rays x 1024 samples "
                         "(train_manager.cpp:69-70, points_sampler.hpp)")
    ap.add_argument("--warp", choices=("contract", "perspective"),
                    default=None,
                    help="override ModelConfig.warp_mode — perspective "
                         "certifiably disqualifies run dedup "
                         "(models/hash_field.py), so its flagship rate "
                         "is a separate headline")
    ap.add_argument("--no-quality-machinery", action="store_true",
                    help="disable the round-2/3 quality additions "
                         "(explore slots + explore-sparsity term) to "
                         "measure the round-1 pure-throughput operating "
                         "point — the documented quality/perf knob")
    ap.add_argument("--encode_chunk", type=int, default=None,
                    help="override ModelConfig.encode_chunk (points per "
                         "paged-encode chunk) for chunk-size probes")
    ap.add_argument("--budget_s", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 480)))
    ap.add_argument("--no-cache-write", action="store_true")
    args = ap.parse_args()

    _arm["key"] = (f"quick={args.quick},dense={args.dense},"
                   f"warp={args.warp},"
                   f"noqm={args.no_quality_machinery},rays={args.rays},"
                   f"chunk={args.encode_chunk}")
    threading.Thread(target=_watchdog, args=(args.budget_s,),
                     daemon=True).start()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_compilation_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from f2nerf_tpu.core.config import Config
    from f2nerf_tpu.models import occupancy, renderer
    from f2nerf_tpu.train.optim import make_optimizer
    from f2nerf_tpu.train.step import make_train_step

    import dataclasses

    cfg = Config.tiny() if args.quick else Config()
    if args.warp is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           warp_mode=args.warp))
    if args.encode_chunk is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           encode_chunk=args.encode_chunk))
    if args.no_quality_machinery:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, occ_explore_slots=0),
            train=dataclasses.replace(cfg.train,
                                      explore_sparsity_weight=0.0))
    if args.dense:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           sampler_mode="dense"))
        if args.rays is None:
            args.rays = 512
    rays = args.rays
    if rays is None and not args.quick:
        # throughput bench: saturate the chip (the reference's 512-ray
        # batch is latency-bound at occ-mode sample counts)
        rays = 8192
    if rays:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           pts_batch_size=rays * 512))
    batch = cfg.train.rays_per_step
    n_images = 8

    key = jax.random.key(0)
    params, consts = renderer.init(key, cfg.model, n_images)
    if cfg.model.warp_mode == "perspective":
        # warp tables come from the training cameras (Trainer does the
        # same, train/loop.py); a ring of poses stands in here
        from f2nerf_tpu.data.synthetic import make_sphere_dataset
        from f2nerf_tpu.models.warp import build_warp
        tables = build_warp(
            make_sphere_dataset(n_images=n_images, h=8, w=8).poses,
            cfg.model)
        consts["field"]["warp_anchors"] = tables.anchors
        consts["field"]["warp_rows"] = tables.rows
    optimizer = make_optimizer(cfg.train)
    opt_state = optimizer.init(params)
    occ_grid = occupancy.init_grid(cfg.model)
    if cfg.model.sampler_mode == "occ":
        # Seed a realistic ~25%-occupied grid: steady-state (past
        # occ_warmup) with an EMPTY grid would make every slot an
        # invalid segment-0 re-walk — degenerate clustered gathers that
        # overstate throughput.
        thresh = occupancy.sigma_threshold(cfg.model)
        occ_rng = np.random.default_rng(1)
        dense = jnp.asarray(
            occ_rng.random(occ_grid.shape[-3:]) < 0.25, jnp.float32)
        seeded = dense * (2.0 * thresh)
        if occ_grid.ndim == 4:
            occ_grid = jnp.stack([seeded, seeded])
        else:
            occ_grid = seeded

    h, w = 256, 256
    rng = np.random.default_rng(0)
    poses = jnp.tile(jnp.eye(3, 4)[None], (n_images, 1, 1))
    intr = jnp.tile(jnp.asarray(
        [[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1.0]])[None],
        (n_images, 1, 1))

    step_fn = jax.jit(make_train_step(cfg, optimizer),
                      donate_argnums=(0, 1, 2))

    def batch_data():
        cam = rng.integers(0, n_images, batch).astype(np.int32)
        ij = np.stack([rng.integers(0, h, batch),
                       rng.integers(0, w, batch)], -1).astype(np.int32)
        gt = rng.random((batch, 3)).astype(np.float32)
        return cam, ij, gt

    # Measure steady state: past occ_warmup_steps (real occupancy bits)
    # and past occ_refresh_warmup (slow partial-refresh cadence) — the
    # regime 90% of a 20k-step run spends its time in.
    step0 = max(cfg.model.occ_warmup_steps,
                cfg.model.occ_refresh_warmup) + 1024

    if cfg.model.sampler_mode == "occ":
        spr = cfg.model.occ_keep * cfg.model.occ_samples_per_segment
        mode = f"occ sampler, {spr} samples/ray"
        if args.warp == "perspective":
            mode += ", perspective warp (no run dedup)"
        if args.no_quality_machinery:
            mode += ", quality machinery off (r1 parity point)"
    else:
        mode = (f"dense, {cfg.model.n_samples} samples/ray"
                + (", reference-parity point 512x1024"
                   if args.dense else ""))
    unit = (f"rays/s/chip (fwd+bwd+adam, {mode})"
            if not args.quick else "rays/s/chip (tiny cfg)")
    # the watchdog may fire between the two _best assignments in the
    # measurement loop; unit is known now, so publish it before any
    # value can appear (ADVICE r3: a None unit in the daemon thread
    # would raise and skip the emit entirely)
    _best["unit"] = unit

    # warmup / compile (float() forces real completion; NB
    # block_until_ready does not actually block under the axon platform)
    cam, ij, gt = batch_data()
    params, opt_state, occ_grid, m = step_fn(
        params, opt_state, occ_grid, consts, poses, intr,
        jnp.asarray(step0, jnp.int32), cam, ij, gt)
    _ = float(m.loss)

    # Chunked measurement: the watchdog reads _best between chunks, so
    # a run cut short still reports a real steady-state number.
    # chunk=10: each chunk boundary forces a device sync (the watchdog
    # needs fresh numbers), but syncs are not free over the tunnel —
    # 5-iter chunks measured ~5% slower than round 1's single-sync
    # methodology; 10-iter chunks keep the watchdog current within
    # ~1.5 s while adding only 4 extra syncs per 50 iters.
    iters = 10 if args.quick else args.iters
    chunk = max(1, min(10, iters))
    n_chips = jax.device_count()
    done = 0
    t_total = 0.0
    k = 0
    while done < iters:
        this = min(chunk, iters - done)
        batches = [batch_data() for _ in range(this)]
        t0 = time.perf_counter()
        for cam, ij, gt in batches:
            params, opt_state, occ_grid, m = step_fn(
                params, opt_state, occ_grid, consts, poses, intr,
                jnp.asarray(step0 + k + 1, jnp.int32), cam, ij, gt)
            k += 1
        _ = float(m.loss)
        t_total += time.perf_counter() - t0
        done += this
        _best["value"] = done * batch / t_total / n_chips
        _best["unit"] = unit
        _best["iters_done"] = done

    value = _best["value"]
    if not args.no_cache_write and not args.quick:
        try:
            SELF_CACHE.write_text(json.dumps(
                {"value": round(value, 1), "unit": unit,
                 "iters": iters, "wall_date": time.strftime("%Y-%m-%d"),
                 "git_sha": _git_sha(), "arm": _arm["key"]}))
        except OSError:
            pass
    _emit(value, unit)


if __name__ == "__main__":
    main()
