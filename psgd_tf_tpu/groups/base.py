"""Uniform interface contract for preconditioner families.

Every family in `psgd_tf_tpu.groups` is a *pure functional* module over a
registered pytree state, with three entry points:

    init(key, n_or_shape, ...)          -> state
    update(state, v, h, step, key=None) -> state      # one Lie-group step
    apply(state, g)                     -> pre_grad   # P @ g with P = Q^T Q

This replaces the reference's split personality (free functions for
dense/kron/splu, a stateful class for UVd — see SURVEY.md §1) with one
uniform, jit/shard-friendly contract. `v` is the random probe, `h` the
Hessian-vector product H v (or a gradient perturbation; the update criterion
is jointly scale-invariant in (v, h)).

Whole-model families (dense, diag, xmat, shift, splu, lra) consume *flat*
(n,) vectors; the kron family consumes per-tensor matrices.
"""
from __future__ import annotations

from typing import Any, Protocol

import jax

PreconditionerState = Any


class Family(Protocol):
    """Structural protocol each family module satisfies."""

    def init(self, *args, **kwargs) -> PreconditionerState: ...

    def update(
        self,
        state: PreconditionerState,
        v: jax.Array,
        h: jax.Array,
        step: jax.Array | float,
        key: jax.Array | None = None,
    ) -> PreconditionerState: ...

    def apply(self, state: PreconditionerState, g: jax.Array) -> jax.Array: ...


# Registry of whole-model (flat-vector) families, filled in by
# psgd_tf_tpu.groups.__init__. Kron is per-tensor and handled separately
# by the optimizer.
FLAT_FAMILIES: dict[str, Any] = {}


def register_flat_family(name: str, module: Any) -> None:
    FLAT_FAMILIES[name] = module
