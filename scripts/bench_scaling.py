#!/usr/bin/env python
"""Multi-chip / multi-host scaling benchmark (BASELINE.md: >=85% rays/s
efficiency 1 host -> 4 hosts).

Measures train-step throughput at 1, 2, ..., N devices with the ray
batch sharded over the data mesh and parameters replicated, and reports
scaling efficiency. Runs identically on:

* real multi-chip hardware (run under `jax.distributed` on each host:
  JAX_COORDINATOR_ADDRESS=... python scripts/bench_scaling.py),
* a virtual CPU mesh for plumbing validation:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py --quick

Prints one JSON line per device count plus a summary efficiency line.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def bench_devices(n_devices: int, cfg, iters: int) -> float:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from f2nerf_tpu.models import occupancy, renderer
    from f2nerf_tpu.train.optim import make_optimizer
    from f2nerf_tpu.train.step import make_train_step

    batch = cfg.train.rays_per_step
    assert batch % n_devices == 0
    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    params, consts = renderer.init(jax.random.key(0), cfg.model, 8)
    optimizer = make_optimizer(cfg.train)
    opt_state = optimizer.init(params)
    occ = occupancy.init_grid(cfg.model)
    params, consts, opt_state, occ = (
        jax.device_put(x, repl) for x in (params, consts, opt_state, occ))
    poses = jax.device_put(jnp.tile(jnp.eye(3, 4)[None], (8, 1, 1)), repl)
    intr = jax.device_put(jnp.tile(jnp.asarray(
        [[200.0, 0, 128.0], [0, 200.0, 128.0], [0, 0, 1.0]])[None],
        (8, 1, 1)), repl)

    rng = np.random.default_rng(0)

    def batch_data():
        cam = rng.integers(0, 8, batch).astype(np.int32)
        ij = np.stack([rng.integers(0, 256, batch),
                       rng.integers(0, 256, batch)], -1).astype(np.int32)
        gt = rng.random((batch, 3)).astype(np.float32)
        if jax.process_count() > 1:
            # every process draws the same global batch and contributes
            # its slice (mesh_lib.shard_batch multi-host contract)
            from f2nerf_tpu.parallel import mesh as mesh_lib
            pid, np_ = jax.process_index(), jax.process_count()
            lo, hi = pid * batch // np_, (pid + 1) * batch // np_
            return mesh_lib.shard_batch(mesh, cam[lo:hi], ij[lo:hi],
                                        gt[lo:hi])
        return (jax.device_put(cam, shard), jax.device_put(ij, shard),
                jax.device_put(gt, shard))

    step_fn = jax.jit(make_train_step(cfg, optimizer),
                      donate_argnums=(0, 1, 2))
    cam, ij, gt = batch_data()
    params, opt_state, occ, m = step_fn(
        params, opt_state, occ, consts, poses, intr,
        jnp.asarray(0, jnp.int32), cam, ij, gt)
    _ = float(m.loss)  # force completion (block_until_ready is not
    #                    reliable under the axon tunnel)

    batches = [batch_data() for _ in range(iters)]
    t0 = time.perf_counter()
    for k, (cam, ij, gt) in enumerate(batches):
        params, opt_state, occ, m = step_fn(
            params, opt_state, occ, consts, poses, intr,
            jnp.asarray(k + 1, jnp.int32), cam, ij, gt)
    _ = float(m.loss)
    dt = time.perf_counter() - t0
    return iters * batch / dt


def bench_render(n_devices: int, cfg, iters: int) -> float:
    """Rays/s of the mesh-sharded VALIDATE render (render_rays_chunked
    with mesh=...), the full-image/novel-view serving path."""
    import jax
    from jax.sharding import Mesh

    from f2nerf_tpu.models import renderer

    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("data",))
    params, consts = renderer.init(jax.random.key(0), cfg.model, 8)
    batch = cfg.train.rays_per_step
    rng = np.random.default_rng(0)
    rays_o = rng.normal(0, 0.3, (batch, 3)).astype(np.float32)
    rays_d = rng.normal(0, 1.0, (batch, 3)).astype(np.float32)
    occ = None
    if cfg.model.sampler_mode == "occ":
        from f2nerf_tpu.models import occupancy
        occ = occupancy.occ_values(occupancy.init_grid(cfg.model),
                                   cfg.model, warmup=True)

    def run():
        c, _ = renderer.render_rays_chunked(
            params, consts, rays_o, rays_d, cfg.model, chunk=batch,
            occ_bits=occ, mesh=mesh)
        return float(np.asarray(c).sum())  # force completion

    run()                                  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = time.perf_counter() - t0
    return iters * batch / dt


def _launch_multiprocess(args) -> None:
    """Spawn N coordinator-connected CPU worker copies of this script
    (each with 2 virtual CPU devices) and relay worker 0's output."""
    import os
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = ""  # drop the TPU-tunnel sitecustomize
    base = [sys.executable, str(pathlib.Path(__file__).resolve()),
            "--multiprocess", str(args.multiprocess),
            "--port", str(port), "--iters", str(args.iters),
            "--mode", args.mode]
    if args.quick:
        base.append("--quick")
    if args.rays:
        base += ["--rays", str(args.rays)]
    if args.counts:
        base += ["--counts", args.counts]
    procs = [subprocess.Popen(base + ["--worker", str(i)], env=env,
                              stdout=(None if i == 0 else
                                      subprocess.DEVNULL),
                              stderr=subprocess.DEVNULL)
             for i in range(args.multiprocess)]
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes {rc}")


def main() -> None:
    from f2nerf_tpu.core.config import Config
    from f2nerf_tpu.parallel.mesh import maybe_initialize_distributed

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rays", type=int, default=None)
    ap.add_argument("--counts", type=str, default=None,
                    help="comma-separated device counts (default sweep)")
    ap.add_argument("--mode", choices=("train", "render"),
                    default="train")
    ap.add_argument("--multiprocess", type=int, default=0,
                    help="launch N coordinator-connected localhost CPU "
                         "processes and bench over the joint mesh "
                         "(exercises the real multi-host paths: "
                         "jax.distributed + per-process batch slices)")
    ap.add_argument("--worker", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.multiprocess > 0 and args.worker is None:
        _launch_multiprocess(args)
        return

    import jax
    if args.worker is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.multiprocess, process_id=args.worker)
        if args.counts is None:
            args.counts = str(jax.device_count())
    else:
        maybe_initialize_distributed()
    import dataclasses

    cfg = Config.tiny() if args.quick else Config()
    rays = args.rays or (1024 if args.quick else 8192)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       pts_batch_size=rays * 512))

    n_total = jax.device_count()
    if args.counts:
        counts = [int(c) for c in args.counts.split(",")]
    else:
        counts = [c for c in [1, 2, 4, 8, 16, 32] if c <= n_total]
    results = {}
    fn = bench_devices if args.mode == "train" else bench_render
    for c in counts:
        rate = fn(c, cfg, args.iters)
        results[c] = rate
        print(json.dumps({"devices": c, "rays_per_s": round(rate, 1),
                          "rays_per_s_per_chip": round(rate / c, 1)}))
    # per-chip efficiency relative to the smallest measured mesh
    base = results[counts[0]] / counts[0]
    eff = {c: (results[c] / c) / base for c in counts}
    print(json.dumps({
        "metric": "scaling_efficiency",
        "per_devices": {str(c): round(e, 4) for c, e in eff.items()},
        "value": round(eff[counts[-1]], 4),
        "unit": f"rays/s efficiency at {counts[-1]} devices vs 1",
    }))


if __name__ == "__main__":
    main()
