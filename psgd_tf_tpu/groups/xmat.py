"""X-shape (flipping-subgroup) preconditioner.

The reference README names this family ("Subgroup {e, flipping} induces the
X-shape matrices", /root/reference/README.md:15) but the TF repo ships no
implementation; we derive it from the Lie-group math.

Q is an "X-matrix": Q[i, i] = a_i and Q[i, n-1-i] = b_i — a diagonal plus an
anti-diagonal. The set of invertible X-matrices is closed under
multiplication and inversion (it is the group algebra of {e, flip}), so the
standard PSGD relative-gradient update applies with the gradient projected
onto the X sparsity pattern.

Derivation (f = flip):
  Q x        = a*x + b*f(x)
  Q^T x      = a*x + f(b)*f(x)
  Q^{-T} v   : pairing rows (i, n-1-i) gives 2x2 systems with determinant
               D = a*f(a) - b*f(b), so  Q^{-T} v = (f(a)*v - f(b)*f(v)) / D
  group grad G = X-project(u u^T - w w^T), u = Q h, w = Q^{-T} v:
               diag part  p = u*u - w*w
               anti part  q = u*f(u) - w*f(w)
  G @ Q      : diag part  p*a + q*f(b),  anti part  p*b + q*f(a)
  Q <- Q - (step / (max(|p|,|q|) + tiny)) * (G @ Q)

TPU-native layout — FOLDED: the math only ever couples index i with its
mirror n-1-i, so the state stores both halves stacked, `af[0, i] = a_i`,
`af[1, i] = a_{n-1-i}` (i < n//2). Every `flip` above becomes "use the
other row": compute splits the (2, m) arrays into (m,) row pairs and
writes the coupled equations explicitly — pure fusable elementwise work
with ZERO data reversals (round 1's flip formulation ran 6.9x slower than
diag purely from the lane-reversal passes; an XLA `rev` on the (2, m)
sublane axis measured even worse, ~86x an elementwise pass, so no
`xf[::-1]` row swaps either). Only the probe fold/unfold at the boundary
reverses data, touching each element once (~6 us at n = 4M on v5e vs
~33 us per flip). On a mesh the folded rows co-locate each (i, n-1-i)
pair, so sharded updates need no cross-device ring pass at all.

Odd n: the center index lies on both diagonals; its diagonal entry is the
scalar `ac` and its anti entry is fixed at 0 (the projected anti gradient
at the center is zero by symmetry).

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
    af: jax.Array  # (2, m) folded diagonal: af[0, i] = a_i, af[1, i] = a_{n-1-i}
    bf: jax.Array  # (2, m) folded anti-diagonal
    ac: jax.Array  # () center diagonal entry; only meaningful when odd
    odd: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def n(self) -> int:
        return 2 * self.af.shape[1] + (1 if self.odd else 0)

    @property
    def a(self) -> jax.Array:
        """Unfolded (n,) diagonal view (tests/diagnostics)."""
        center = self.ac[None] if self.odd else None
        return _unfold(self.af, center)

    @property
    def b(self) -> jax.Array:
        """Unfolded (n,) anti-diagonal view; center is 0 by convention."""
        center = jnp.zeros((1,), self.bf.dtype) if self.odd else None
        return _unfold(self.bf, center)


def _fold(x: jax.Array, m: int, odd: bool):
    """(n,) -> folded (2, m) + center scalar (the only data reversal)."""
    xf = jnp.stack([x[:m], jnp.flip(x[m + 1 :] if odd else x[m:])])
    xc = x[m] if odd else jnp.zeros((), x.dtype)
    return xf, xc


def _unfold(xf: jax.Array, center: jax.Array | None) -> jax.Array:
    parts = [xf[0]] + ([center] if center is not None else []) + [jnp.flip(xf[1])]
    return jnp.concatenate(parts)


def init(n: int, init_scale: float = 1.0, dtype=jnp.float32) -> XMatState:
    m, odd = n // 2, bool(n % 2)
    return XMatState(
        af=jnp.full((2, m), init_scale, dtype=dtype),
        bf=jnp.zeros((2, m), dtype=dtype),
        ac=jnp.asarray(init_scale, dtype=dtype),
        odd=odd,
    )


def matvec(state: XMatState, x: jax.Array) -> jax.Array:
    """Q x = a*x + b*flip(x)."""
    m, odd = state.af.shape[1], state.odd
    (a0, a1), (b0, b1) = state.af, state.bf
    (x0, x1), xc = _fold(x, m, odd)
    tf = jnp.stack([a0 * x0 + b0 * x1, a1 * x1 + b1 * x0])
    return _unfold(tf, (state.ac * xc)[None] if odd else None)


def update(
    state: XMatState,
    v: jax.Array,
    h: jax.Array,
    step: jax.Array | float = 0.01,
    key: jax.Array | None = None,
) -> XMatState:
    del key
    af, bf, ac = state.af, state.bf, state.ac
    m, odd = af.shape[1], state.odd
    dtype = af.dtype

    # all math on (m,) row pairs: "flip" = use the other row, no reversals
    a0, a1 = af[0], af[1]
    b0, b1 = bf[0], bf[1]
    (h0, h1), hc = _fold(h, m, odd)
    (v0, v1), vc = _fold(v, m, odd)

    u0 = a0 * h0 + b0 * h1                            # Q h
    u1 = a1 * h1 + b1 * h0
    det = a0 * a1 - b0 * b1                           # (m,) pair determinant
    w0 = (a1 * v0 - b1 * v1) / det                    # Q^{-T} v
    w1 = (a0 * v1 - b0 * v0) / det

    p0 = u0 * u0 - w0 * w0                            # diag gradient
    p1 = u1 * u1 - w1 * w1
    qv = u0 * u1 - w0 * w1                            # anti gradient (symmetric)

    max_p = jnp.maximum(
        jnp.max(jnp.abs(p0), initial=0.0), jnp.max(jnp.abs(p1), initial=0.0)
    )
    max_q = jnp.max(jnp.abs(qv), initial=0.0)
    if odd:
        uc = ac * hc
        wc = vc / ac
        pc = uc * uc - wc * wc
        max_p = jnp.maximum(max_p, jnp.abs(pc))
    step0 = linalg.step_scale(step, jnp.maximum(max_p, max_q), dtype)

    new_af = jnp.stack([
        a0 - step0 * (p0 * a0 + qv * b1),
        a1 - step0 * (p1 * a1 + qv * b0),
    ])
    new_bf = jnp.stack([
        b0 - step0 * (p0 * b0 + qv * a1),
        b1 - step0 * (p1 * b1 + qv * a0),
    ])
    new_ac = ac - step0 * pc * ac if odd else ac
    return XMatState(af=new_af, bf=new_bf, ac=new_ac, odd=odd)


def apply(state: XMatState, g: jax.Array) -> jax.Array:
    """P g = Q^T (Q g)."""
    af, bf, ac = state.af, state.bf, state.ac
    m, odd = af.shape[1], state.odd
    a0, a1 = af[0], af[1]
    b0, b1 = bf[0], bf[1]
    (g0, g1), gc = _fold(g, m, odd)
    t0 = a0 * g0 + b0 * g1                            # Q g
    t1 = a1 * g1 + b1 * g0
    of = jnp.stack([a0 * t0 + b1 * t1, a1 * t1 + b0 * t0])  # Q^T (Q g)
    return _unfold(of, (ac * ac * gc)[None] if odd else None)


def materialize(state: XMatState) -> jax.Array:
    """Dense P = Q^T Q for tests."""
    q = jnp.diag(state.a) + jnp.fliplr(jnp.diag(state.b))
    return q.T @ q
