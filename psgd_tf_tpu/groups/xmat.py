"""X-shape (flipping-subgroup) preconditioner.

The reference README names this family ("Subgroup {e, flipping} induces the
X-shape matrices", /root/reference/README.md:15) but the TF repo ships no
implementation; we derive it from the Lie-group math.

Q is an "X-matrix": Q[i, i] = a_i and Q[i, n-1-i] = b_i — a diagonal plus an
anti-diagonal. The set of invertible X-matrices is closed under
multiplication and inversion (it is the group algebra of {e, flip}), so the
standard PSGD relative-gradient update applies with the gradient projected
onto the X sparsity pattern.

Derivation used here (f = flip):
  Q x        = a*x + b*f(x)
  Q^T x      = a*x + f(b)*f(x)
  Q^{-T} v   : pairing rows (i, n-1-i) gives 2x2 systems with determinant
               D = a*f(a) - b*f(b), so  Q^{-T} v = (f(a)*v - f(b)*f(v)) / D
  group grad G = X-project(u u^T - w w^T), u = Q h, w = Q^{-T} v:
               diag part  p = u*u - w*w
               anti part  q = u*f(u) - w*f(w)
  G @ Q      : diag part  p*a + q*f(b),  anti part  p*b + q*f(a)
  Q <- Q - (step / (max(|p|,|q|) + tiny)) * (G @ Q)

Odd n: the center index lies on both diagonals; we keep the convention
b[center] = 0 (enforced at init and preserved by the update since the
projected anti gradient at the center is zeroed).

O(n) state, O(n) compute, pure VPU elementwise work — but unlike diag it
couples coordinate i with coordinate n-1-i, shortcutting gradients across
distant positions.
"""
from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from psgd_tf_tpu.ops import linalg


@flax.struct.dataclass
class XMatState:
    a: jax.Array  # (n,) diagonal
    b: jax.Array  # (n,) anti-diagonal; b[n//2] == 0 when n is odd


def _center_mask(n: int, dtype) -> jax.Array:
    """1 everywhere, 0 at the center index when n is odd."""
    if n % 2 == 0:
        return jnp.ones((n,), dtype=dtype)
    return jnp.ones((n,), dtype=dtype).at[n // 2].set(0.0)


def init(n: int, init_scale: float = 1.0, dtype=jnp.float32) -> XMatState:
    return XMatState(
        a=jnp.full((n,), init_scale, dtype=dtype),
        b=jnp.zeros((n,), dtype=dtype),
    )


def matvec(state: XMatState, x: jax.Array) -> jax.Array:
    """Q x = a*x + b*flip(x)."""
    return state.a * x + state.b * jnp.flip(x)


def update(
    state: XMatState,
    v: jax.Array,
    h: jax.Array,
    step: jax.Array | float = 0.01,
    key: jax.Array | None = None,
) -> XMatState:
    del key
    a, b = state.a, state.b
    n = a.shape[0]
    dtype = a.dtype

    u = a * h + b * jnp.flip(h)  # Q h
    det = a * jnp.flip(a) - b * jnp.flip(b)
    w = (jnp.flip(a) * v - jnp.flip(b) * jnp.flip(v)) / det  # Q^{-T} v

    p = u * u - w * w
    q = (u * jnp.flip(u) - w * jnp.flip(w)) * _center_mask(n, dtype)

    step0 = jnp.asarray(step, dtype) / (
        jnp.maximum(linalg.max_abs(p), linalg.max_abs(q)) + linalg.tiny(dtype)
    )
    new_a = a - step0 * (p * a + q * jnp.flip(b))
    new_b = b - step0 * (p * b + q * jnp.flip(a))
    return XMatState(a=new_a, b=new_b)


def apply(state: XMatState, g: jax.Array) -> jax.Array:
    """P g = Q^T (Q g)."""
    t = matvec(state, g)
    return state.a * t + jnp.flip(state.b) * jnp.flip(t)


def materialize(state: XMatState) -> jax.Array:
    """Dense P = Q^T Q for tests."""
    n = state.a.shape[0]
    q = jnp.diag(state.a) + jnp.fliplr(jnp.diag(state.b))
    return q.T @ q
