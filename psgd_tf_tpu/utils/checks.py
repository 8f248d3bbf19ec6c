"""Finite-state checks: detect NaN/Inf divergence in params or Q state.

The reference README discusses NaN divergence as the practical failure
mode of too-aggressive preconditioner fitting
(/root/reference/README.md:56); the reference offers no tooling for it.
`assert_finite` raises (via checkify) inside jit; `first_nonfinite` is the
debugging helper that names the offending pytree leaf.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def all_finite(tree: Any) -> jax.Array:
    """Scalar bool: every leaf entry is finite. Cheap enough to run every
    step (a fused reduction; no host sync unless the caller checks it)."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
    return ok


def assert_finite(tree: Any, name: str = "state") -> None:
    """checkify-able assertion for use inside jitted steps:

        checked = checkify.checkify(step_fn)
        err, out = checked(...)
        err.throw()
    """
    checkify.check(all_finite(tree), f"non-finite values in {name}")


def first_nonfinite(tree: Any) -> list[str]:
    """Host-side debugging: key-paths of leaves containing NaN/Inf."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.all(jnp.isfinite(leaf))):
            bad.append(jax.tree_util.keystr(path))
    return bad
