"""Device mesh and sharding layout.

The reference is strictly single-GPU (SURVEY.md §2.3 — no NCCL/MPI/comm
code anywhere); this module is the net-new multi-chip design mandated by
BASELINE.md: a 1-D ``data`` mesh over all chips, with

* the ray batch (cam_idx / ij / gt) sharded along ``data``,
* parameters + hash constants replicated,

so XLA emits a single fused gradient all-reduce over ICI from the pjit
partitioning — the TPU-native analogue of DDP, with deterministic
scatter-add hash gradients per shard (segment-sum lowering, not atomics).

Multi-host entry: call :func:`maybe_initialize_distributed` before device
queries; per-host data loading shards the ray batch by process index.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when launched in a multi-process env
    (no-op single-process)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(devices=None) -> Mesh:
    """1-D data mesh over all available devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for ray batches."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, consts, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host batch arrays onto the mesh, sharded along the batch
    dim. Single-process: a plain device_put. Multi-host: each process
    contributes its local slice (callers pass per-host batches of
    global_batch / process_count rows) via
    make_array_from_process_local_data, so batches never cross DCN.
    """
    s = data_sharding(mesh)
    if jax.process_count() > 1:
        return tuple(
            jax.make_array_from_process_local_data(s, a) for a in arrays)
    return tuple(jax.device_put(a, s) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / consts / opt state) over the mesh."""
    r = replicated(mesh)
    return jax.device_put(tree, r)
