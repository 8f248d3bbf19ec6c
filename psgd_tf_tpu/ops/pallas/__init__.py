"""Pallas TPU fast paths for the hot structured linear algebra.

Three kernels (each with the XLA path as fallback and oracle):

  - tri.solve_triangular: blocked triangular solve — the op TPUs lack
    natively (SURVEY.md §7 hard part #1). Diagonal blocks invert exactly
    via Newton iteration (finite termination on triangular matrices),
    off-diagonal substitution is MXU matmuls.
  - kron_dd.fused_update: the whole (dense, dense) Kronecker update —
    balancing, A, the two triangular solves for Bt, both group gradients,
    max-abs step normalization, and the Q updates — in ONE kernel launch,
    keeping both factors in VMEM end to end.
  - dense_upd.fused_update: the dense family's rank-2 update in one kernel.

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

    Used by parallel.build_sharded_step — pallas_call is opaque to GSPMD,
    so sharded steps must trace the annotation-friendly XLA math. (Sharded
    pallas via shard_map, with psums of the rank-space reductions, is the
    designed follow-up.)
    """
    global _disabled_depth
    _disabled_depth += 1
    try:
        yield
    finally:
        _disabled_depth -= 1


from psgd_tf_tpu.ops.pallas import dense_upd, kron_dd, lra_upd, tri  # noqa: E402

__all__ = ["enabled", "tri", "kron_dd", "dense_upd", "lra_upd"]
