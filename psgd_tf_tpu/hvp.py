"""Curvature probes: Hessian-vector products, exact and finite-difference.

Centralizes what every reference demo re-implements with nested
GradientTapes (SURVEY.md §1): exact Hvp via *forward-over-reverse*
`jax.jvp(jax.value_and_grad(f))` — one call yields loss, gradient and H·v,
cheaper and cleaner than the reference's reverse-over-reverse double tape
(/root/reference/mnist_with_lenet5.py:45-50,
/root/reference/preconditioned_stochastic_gradient_descent.py:706-714) —
and the finite-difference fallback for losses without second derivatives
(ref :716-727, neural_machine_translation_with_attention.py:179,196-198).

Convention: probes `v` are unit normals and the FD result is rescaled by
1/delta, so exact and FD produce (v, h) pairs on the same scale. The
reference feeds the UVd update v/delta, h/delta with v ~ N(0, delta^2)
(ref :721, :734-736) — identical up to fp rounding; for the kron path the
update criterion is jointly scale-invariant in (v, h) so the convention
does not alter trajectories.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from psgd_tf_tpu.ops import linalg

PyTree = Any


def random_like(key: jax.Array, params: PyTree, stddev: float = 1.0) -> PyTree:
    """One N(0, stddev^2) probe per parameter tensor (ref :713)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    probes = [
        stddev * jax.random.normal(k, leaf.shape, leaf.dtype)
        for k, leaf in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, probes)


def exact(
    loss_fn: Callable, params: PyTree, v: PyTree, *args
) -> tuple[jax.Array, PyTree, PyTree]:
    """(loss, grad, H v) via forward-over-reverse in a single pass."""
    vag = lambda p: jax.value_and_grad(loss_fn)(p, *args)
    (loss, grads), (_, hvs) = jax.jvp(vag, (params,), (v,))
    return loss, grads, hvs


def finite_diff(
    loss_fn: Callable,
    params: PyTree,
    v: PyTree,
    *args,
    delta: float | None = None,
) -> tuple[jax.Array, PyTree, PyTree]:
    """(loss, grad, (grad(theta + delta v) - grad(theta)) / delta).

    delta defaults to sqrt(machine eps) of the parameter dtype (ref :683).
    The gradient returned is the *unperturbed* one, which is what gets
    preconditioned (ref :747). Purely functional: there is no in-place
    perturbation to undo (contrast ref :722, :760-762).
    """
    dtype = jnp.result_type(*jax.tree_util.tree_leaves(params))
    if delta is None:
        delta = linalg.delta_scale(dtype)
    loss, grads = jax.value_and_grad(loss_fn)(params, *args)
    params_pert = jax.tree_util.tree_map(lambda p, t: p + delta * t, params, v)
    grads_pert = jax.grad(loss_fn)(params_pert, *args)
    hvs = jax.tree_util.tree_map(lambda a, b: (a - b) / delta, grads_pert, grads)
    return loss, grads, hvs


def grad_only(loss_fn: Callable, params: PyTree, *args) -> tuple[jax.Array, PyTree]:
    """(loss, grad) — the no-preconditioner-update branch (ref :740-743)."""
    return jax.value_and_grad(loss_fn)(params, *args)
