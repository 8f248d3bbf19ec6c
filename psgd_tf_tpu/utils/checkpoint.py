"""Checkpoint / resume for PSGD training.

The reference has no persistence: preconditioner state lives only in
process `tf.Variable`s and demos retrain from scratch (SURVEY.md §5). Here
the whole training state is one pytree `(params, PSGDState, rng_key)`, so
checkpointing is orbax over that tree — crucially this saves the Q factors,
which carry the optimizer's accumulated curvature memory.

On a multi-host mesh each process writes its own shards (orbax handles
distributed arrays natively); restore with the same sharding policy via
`restore(..., like=state_with_shardings)`.
"""
from __future__ import annotations

import importlib
import os
from typing import Any

import jax

Step = int


def _ocp():
    """Lazy orbax import so `import psgd_tf_tpu` (pure optimizer use)
    never hard-requires the checkpointing dependency."""
    return importlib.import_module("orbax.checkpoint")


def save(directory: str, step: Step, train_state: Any, *, force: bool = False) -> None:
    """Write `train_state` (any pytree of arrays) under `directory/step`."""
    path = os.path.join(os.path.abspath(directory), str(step))
    with _ocp().StandardCheckpointer() as ckptr:
        ckptr.save(path, train_state, force=force)


def restore(directory: str, step: Step | None = None, like: Any = None) -> Any:
    """Restore a checkpoint; `step=None` loads the latest.

    `like`: a pytree of abstract or concrete arrays (e.g. a freshly
    `opt.init`-ed state, optionally device_put to a sharding policy); when
    given, arrays restore with its structure, dtypes, and shardings.
    """
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(directory, str(step))
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, abstract)


def latest_step(directory: str) -> Step | None:
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None
