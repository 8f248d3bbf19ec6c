"""Stateful closure-style `UVd` optimizer — the reference's class API.

Reference parity: class UVd,
/root/reference/preconditioned_stochastic_gradient_descent.py:630-764.
The reference wraps only the low-rank (UVd) family in a stateful object
whose `step(closure)` evaluates a loss closure, updates the preconditioner
with a probability-`preconditioner_update_probability` coin, preconditions
and clips the gradient, and applies the parameter update in place,
returning whatever the closure returned (ref :692-764). Hyperparameters
are mutable after construction (the reference stores them as tf.Variables
and documents `.assign` mutation, ref :660-663; demoed live in
rnn_xor_UVd_preconditioner.py:62-69).

This wrapper keeps those ergonomics on top of the pure-functional
`optim.PSGD`:

  * ctor kwargs match the reference one-for-one (`rank_of_modification`,
    `preconditioner_init_scale`, `lr_params`, `lr_preconditioner`,
    `grad_clip_max_norm` (None = no clipping), and
    `preconditioner_update_probability`, `exact_hessian_vector_product`);
  * `opt.lr_params = 0.005` etc. mutate mid-run WITHOUT recompiling —
    they are traced scalars in the state (plain `=` works here; no
    `.assign` footgun);
  * flipping `opt.exact_hessian_vector_product` switches the Hvp autodiff
    graph, so it triggers one recompile per direction (both stay cached) —
    same cost profile as the reference's `tf.cond` over two traced
    branches;
  * the closure takes the parameter pytree explicitly —
    `closure(params, *args) -> loss` — because JAX parameters are values,
    not variables. The wrapper owns `params`, the optimizer state, and the
    PRNG key, and `step` advances all three.

The reference's closure-determinism requirement for finite-difference Hvp
(ref :646-651) holds here in a stronger form for free: the closure is a
pure traced function, so both gradient evaluations see identical
randomness by construction.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from psgd_tf_tpu.optim.psgd import PSGD

PyTree = Any

# closures the step cache pins at once; small because the intended usage
# is one long-lived closure (ref :692), and each entry retains the
# closure's captures plus a compiled executable
_JIT_CACHE_SIZE = 8


class UVd:
    """Stateful UVd (low-rank Q = (I + U V^T) diag(d)) PSGD optimizer."""

    def __init__(
        self,
        params_with_grad: PyTree,
        rank_of_modification: int = 10,
        preconditioner_init_scale: float = 1.0,
        lr_params: float = 0.01,
        lr_preconditioner: float = 0.01,
        grad_clip_max_norm: float | None = None,
        preconditioner_update_probability: float = 1.0,
        exact_hessian_vector_product: bool = True,
        key: jax.Array | None = None,
        preconditioner: str = "lra",
    ):
        # `preconditioner` generalizes the class beyond the reference: the
        # same closure ergonomics work for any flat family ('lra' is the
        # reference's UVd; 'dense', 'diag', 'xmat', 'splu' also accepted).
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._key, init_key = jax.random.split(self._key)
        self._opt = PSGD(
            preconditioner=preconditioner,
            rank=rank_of_modification,
            init_scale=preconditioner_init_scale,
            lr_params=lr_params,
            lr_preconditioner=lr_preconditioner,
            grad_clip_max_norm=grad_clip_max_norm,
            preconditioner_update_probability=preconditioner_update_probability,
            exact_hessian_vector_product=exact_hessian_vector_product,
        )
        self._params = params_with_grad
        self._state = self._opt.init(params_with_grad, init_key)
        # jit cache: key includes id(closure) for O(1) lookup, but each
        # entry also HOLDS the closure strongly and checks identity on hit.
        # Keying on id alone is unsound — CPython reuses addresses after
        # GC, so a fresh closure allocated at a dead closure's id would
        # silently run the old compiled program. Pinning the closure in
        # the cache makes its id un-reusable while the entry lives, and
        # the `is` check guards the impossible-by-construction residue.
        # BOUNDED (FIFO, _JIT_CACHE_SIZE): a per-step `lambda p: loss(p,
        # batch)` pattern would otherwise pin every batch + one compiled
        # executable forever. Eviction is aliasing-safe — dropping an
        # entry un-pins its closure, and any future id collision finds no
        # stale mapping to hit.
        self._jitted: dict[tuple, tuple[Callable, Callable]] = {}
        self.last_aux: dict[str, jax.Array] = {}

    # ------------------------------------------------------------ properties

    @property
    def params(self) -> PyTree:
        """Current parameter values (the reference mutates its inputs in
        place; here the wrapper owns the authoritative copy)."""
        return self._params

    @property
    def state(self):
        """Full PSGDState (checkpoint this together with `params`)."""
        return self._state

    def _get_hyper(self, name):
        return getattr(self._state.hyper, name)

    def _set_hyper(self, **kw):
        self._state = PSGD.set_hyper(self._state, **kw)

    @property
    def lr_params(self):
        return self._get_hyper("lr_params")

    @lr_params.setter
    def lr_params(self, v):
        self._set_hyper(lr_params=v)

    @property
    def lr_preconditioner(self):
        return self._get_hyper("lr_preconditioner")

    @lr_preconditioner.setter
    def lr_preconditioner(self, v):
        self._set_hyper(lr_preconditioner=v)

    @property
    def grad_clip_max_norm(self):
        return self._get_hyper("grad_clip_max_norm")

    @grad_clip_max_norm.setter
    def grad_clip_max_norm(self, v):
        self._set_hyper(grad_clip_max_norm=jnp.inf if v is None else v)

    @property
    def preconditioner_update_probability(self):
        return self._get_hyper("update_probability")

    @preconditioner_update_probability.setter
    def preconditioner_update_probability(self, v):
        if self._state.always_update:
            if v >= 1.0:
                return  # still always-update: the compiled branch is right
            # constructed always-update: the coin-flip branch was compiled
            # out (optim/psgd.py), so re-enable it statically (one recompile)
            self._opt = dataclasses.replace(
                self._opt, preconditioner_update_probability=float(v)
            )
            self._state = self._state.replace(always_update=False)
            self._jitted.clear()
        self._set_hyper(update_probability=v)

    @property
    def exact_hessian_vector_product(self) -> bool:
        return self._opt.exact_hessian_vector_product

    @exact_hessian_vector_product.setter
    def exact_hessian_vector_product(self, flag: bool):
        # changes the autodiff graph => static; one recompile per direction
        # (ref switches via a traced tf.cond; demoed rnn_xor :62-69)
        self._opt = dataclasses.replace(
            self._opt, exact_hessian_vector_product=bool(flag)
        )

    # ------------------------------------------------------------------ step

    def step(self, closure: Callable, *args):
        """One PSGD step. `closure(params, *args) -> loss` (a scalar, or an
        iterable whose first element is the loss, matching ref :644-646).
        Returns what the closure returns, evaluated at the pre-step params.
        """
        cache_key = (id(closure), self._opt.exact_hessian_vector_product,
                     self._opt.preconditioner_update_probability >= 1.0)
        entry = self._jitted.get(cache_key)
        step_fn = entry[1] if entry is not None and entry[0] is closure else None
        if step_fn is None:
            def scalar_loss(p, *a):
                out = closure(p, *a)
                return out[0] if isinstance(out, (tuple, list)) else out

            def raw(params, state, key, *a):
                # the closure's full returns are computed in the same jit;
                # XLA CSE dedupes this forward with the one inside
                # opt.step's gradient graph, matching the reference's
                # single-tape evaluation (ref :706-712)
                out = closure(params, *a)
                p2, s2, aux = self._opt.step(
                    scalar_loss, params, state, key, *a
                )
                return p2, s2, aux, out

            step_fn = jax.jit(raw)
            while len(self._jitted) >= _JIT_CACHE_SIZE:
                self._jitted.pop(next(iter(self._jitted)))
            self._jitted[cache_key] = (closure, step_fn)

        self._key, sub = jax.random.split(self._key)
        self._params, self._state, self.last_aux, out = step_fn(
            self._params, self._state, sub, *args
        )
        return out
