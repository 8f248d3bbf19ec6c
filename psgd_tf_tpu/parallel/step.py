"""Builder for mesh-sharded PSGD training steps.

Jits `opt.step` with explicit in/out shardings so GSPMD partitions the
whole step — forward, backward, Hvp, preconditioner update, apply — and
inserts the ICI collectives (psum of grads/Hvps over `data`, psums of the
r-sized reductions over `shard`). No NCCL-style hand-written communication:
the sharding annotations ARE the distributed implementation.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh

from psgd_tf_tpu.optim.psgd import PSGD, PSGDState
from psgd_tf_tpu.parallel import policies


def build_sharded_step(
    opt: PSGD,
    loss_fn: Callable,
    mesh: Mesh,
    state: PSGDState,
    params: Any,
    batch_axes: tuple[int, ...] | None = None,
    donate: bool = True,
):
    """Returns a compiled `step(params, state, key, *batch)`.

    params replicate; preconditioner state shards per family policy; every
    positional batch argument shards its leading axis over `data`
    (`batch_axes` selects which args are batches; default: all).
    """
    rep = policies.replicated(mesh)
    param_sh = jax.tree_util.tree_map(lambda _: rep, params)
    state_sh = policies.state_sharding(mesh, state)
    data_sh = policies.batch_sharding(mesh)

    def batch_shardings(nargs: int):
        axes = set(range(nargs)) if batch_axes is None else set(batch_axes)
        return tuple(data_sh if i in axes else rep for i in range(nargs))

    def make(nargs: int):
        def step_sharded(params, state, key, *batch):
            # trace-time: route family kernel calls through shard_map —
            # pallas_call has no GSPMD partitioning rule, so the fused
            # kernels ride the mesh explicitly (lane-sharded lra with
            # psum'd rank-space reductions; replicated kron/dense)
            from psgd_tf_tpu.ops import pallas as pallas_ops

            with pallas_ops.sharding(mesh, axis="shard"):
                return opt.step(loss_fn, params, state, key, *batch)

        return jax.jit(
            step_sharded,
            in_shardings=(param_sh, state_sh, rep) + batch_shardings(nargs),
            out_shardings=(param_sh, state_sh, None),
            donate_argnums=(0, 1) if donate else (),
        )

    compiled: dict[int, Any] = {}

    def step(params, state, key, *batch):
        fn = compiled.get(len(batch))
        if fn is None:
            fn = compiled[len(batch)] = make(len(batch))
        return fn(params, state, key, *batch)

    return step
