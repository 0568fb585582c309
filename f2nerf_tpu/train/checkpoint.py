"""Orbax checkpointing with true resume.

The reference only ``torch::save``s the module at the end and cannot
resume training (SURVEY.md §5.4 — optimizer state is never saved and
iter_step_ always starts at 0). Here we save params + optimizer state +
step and restore all three, multi-host-aware via Orbax.
"""

from __future__ import annotations

import pathlib
from typing import Any

import orbax.checkpoint as ocp


def save(ckpt_dir: str | pathlib.Path, step: int, params: Any,
         opt_state: Any, consts: Any, extra: Any = None,
         keep_last: int = 2) -> None:
    """Save a checkpoint, retaining the newest ``keep_last`` (the
    reference keeps exactly one, deleting the previous dir first —
    train_manager.cpp:132-136; keeping two guards against a crash
    mid-save)."""
    path = pathlib.Path(ckpt_dir).resolve() / f"step_{step:08d}"
    state = {"params": params, "opt_state": opt_state,
             "consts": consts, "step": step}
    if extra is not None:
        state["extra"] = extra
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    if keep_last > 0:
        import shutil
        steps = sorted(
            (int(p.name.split("_")[1]), p)
            for p in path.parent.glob("step_*") if p.is_dir())
        for _, old in steps[:-keep_last]:
            shutil.rmtree(old, ignore_errors=True)


def latest_step(ckpt_dir: str | pathlib.Path) -> int | None:
    d = pathlib.Path(ckpt_dir)
    if not d.exists():
        return None
    steps = [int(p.name.split("_")[1]) for p in d.glob("step_*")
             if p.is_dir()]
    return max(steps) if steps else None


def restore(ckpt_dir: str | pathlib.Path, abstract_state: Any,
            step: int | None = None) -> dict[str, Any]:
    """Restore {params, opt_state, consts, step}; ``abstract_state`` is a
    matching pytree of arrays (e.g. a freshly initialized state) used for
    structure/sharding."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = pathlib.Path(ckpt_dir).resolve() / f"step_{step:08d}"
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_state)
