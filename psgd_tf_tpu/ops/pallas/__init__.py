"""Pallas TPU fast paths for the hot structured linear algebra.

Kernel inventory (each with the XLA path as fallback and oracle):

  - tri.solve_triangular: blocked triangular solve — the op TPUs lack
    natively (SURVEY.md §7 hard part #1). Diagonal blocks invert exactly
    via Newton iteration (finite termination on triangular matrices),
    off-diagonal substitution is MXU matmuls.
  - kron_dd: the whole (dense, dense) Kronecker update in ONE launch
    (single layer, and a gridded batched variant for same-padded-size
    layer-zoo buckets), factors VMEM-resident to side 1024.
  - kron_sparse: one-launch updates for the (norm, scale)/(dense, scale)/
    (norm, dense) arrow/diag format pairs (mirrors transpose in).
  - dense_upd: the dense family's rank-2 update in one launch (n <= 1536);
    dense_big: the gridded HBM-streaming variant to n = 16384.
  - lra_upd / splu_upd: three-pass streaming updates with ONE packed
    rank-space Gram per family; lra additionally fuses the apply
    (fused_update_apply) and both have mesh-sharded shard_map variants
    with psum'd reductions.

Dispatch policy: `enabled()` is True on TPU backends (overridable via
PSGD_TF_TPU_PALLAS=0/1); family code additionally gates on shape caps
(VMEM budget) and falls back to the XLA path everywhere else.
"""
from __future__ import annotations

import contextlib
import os

import jax

_FORCE = os.environ.get("PSGD_TF_TPU_PALLAS")
_disabled_depth = 0


def enabled() -> bool:
    if _disabled_depth:
        return False
    if _FORCE is not None:
        return _FORCE not in ("0", "false", "off")
    return jax.default_backend() == "tpu"


@contextlib.contextmanager
def disabled():
    """Trace-time escape hatch: force the XLA paths inside this context.
    (Diagnostics / A-B benching; sharded steps now keep the kernels via
    the `sharding` context below instead of falling back to XLA.)
    """
    global _disabled_depth
    _disabled_depth += 1
    try:
        yield
    finally:
        _disabled_depth -= 1


# --------------------------------------------------------------- mesh context
# pallas_call has no GSPMD partitioning rule, so a sharded step can't just
# jit the kernels with sharding annotations. Instead parallel.step enters
# this trace-time context; family code then routes its kernel calls through
# shard_map — truly sharded for the lane-partitioned families (lra's
# fused_update_sharded, psum'd rank-space reductions) and replicated
# (every device runs the full kernel on its replicated factors) for the
# small-factor kron/dense states.

_shard_ctx: tuple | None = None  # (Mesh, axis_name)


@contextlib.contextmanager
def sharding(mesh, axis: str = "shard"):
    """Trace-time context: route family kernel calls through shard_map on
    `mesh`, reducing rank-space quantities over `axis`."""
    global _shard_ctx
    prev = _shard_ctx
    _shard_ctx = (mesh, axis)
    try:
        yield
    finally:
        _shard_ctx = prev


def shard_ctx() -> tuple | None:
    """The active (mesh, axis) sharding context, or None."""
    return None if _disabled_depth else _shard_ctx


def interpret_default() -> bool:
    """Interpret-mode flag for kernels under the sharding context: compiled
    on TPU, interpreted elsewhere (the virtual CPU mesh in tests/dryruns)."""
    return jax.default_backend() != "tpu"


def kernels_active() -> bool:
    """True when family code should take its fused-kernel path: on TPU
    (enabled()) or under the sharding context (interpret mode off-TPU)."""
    return enabled() or shard_ctx() is not None


def replicated_call(fn, *args):
    """Run `fn(*args)` on every device redundantly under the sharding
    context (all operands replicated); plain call when no context is active.

    This is how the kron/dense fused kernels survive GSPMD: their factors
    are replicated by policy (small by design, README.md:54 capacity table),
    so wrapping the opaque pallas_call in an all-replicated shard_map tells
    the partitioner "run this whole kernel per device, no communication".
    """
    ctx = shard_ctx()
    if ctx is None:
        return fn(*args)
    mesh, _ = ctx
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        fn, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False
    )(*args)


from psgd_tf_tpu.ops.pallas import dense_big, dense_upd, kron_dd, kron_multi, kron_sparse, kron_sparse_big, lra_upd, splu_one, splu_upd, tri  # noqa: E402

__all__ = [
    "enabled", "disabled", "sharding", "shard_ctx", "interpret_default",
    "kernels_active", "replicated_call",
    "tri", "kron_dd", "kron_multi", "kron_sparse", "kron_sparse_big",
    "dense_upd", "dense_big", "lra_upd", "splu_one", "splu_upd",
]
