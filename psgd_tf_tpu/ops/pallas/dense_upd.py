"""Fused dense-family update — one Pallas kernel launch.

The rank-2 Lie-group step (groups/dense.py, reference parity
/root/reference/preconditioned_stochastic_gradient_descent.py:26-42):

  a = Q h,  b = Q^{-T} v
  G = triu(a a^T - b b^T)
  Q' = Q - step/(max|G| + tiny) * G Q

One launch: the matvec, the blocked triangular solve (Newton diagonal
inverses), the rank-2 outer difference, the masked max-abs, and the G Q
matmul all happen with Q resident in VMEM. The (n, n) G Q product runs on
the MXU — at the dense family's capacity (n <= 768 here, README.md:54 caps
dense at ~1e4 params) one n^3 MXU matmul beats the XLA path's chain of
VPU cumsums on wall clock and dispatch count.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psgd_tf_tpu.ops.pallas import tri as tri_mod
from psgd_tf_tpu.ops.pallas.tri import BS, VMEM_LIMIT

# VMEM cap: Q, the rank-2 gradient, and the G Q product are all (n, n)
# live at once (~4 n^2 fp32 arrays + solve temps); with the raised
# VMEM_LIMIT (tri.py) 1536 fits where the 16MB default OOMed at 1024.
MAX_N = 1536


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(q_ref, v_ref, h_ref, g_ref, s_ref, out_ref, *rest, nb, tiny,
            with_apply):
    # default MXU precision for the statistical parts (matvec, outer
    # products, G Q) — matches the XLA baseline; the solve below pins
    # Precision.HIGHEST where substitution amplifies rounding
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    hdot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    outer = lambda x, y: jax.lax.dot_general(  # (n,1),(n,1) -> x y^T (n,n)
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    q = q_ref[:]
    a = dot(q, h_ref[:])  # (n, 1)

    # solve Q^T b = v: effective lower system, forward over block rows.
    # All diagonal-block inversions run as ONE batched Newton chain
    # (tri._newton_inv_batched) instead of nb dependent per-row chains —
    # the kernel's latency critical path.
    invs = tri_mod._newton_inv_batched(
        jnp.stack([
            q[i * BS : (i + 1) * BS, i * BS : (i + 1) * BS].T
            for i in range(nb)
        ])
    )
    rows = []
    for i in range(nb):
        acc = v_ref[i * BS : (i + 1) * BS, :]
        for j in range(i):
            mij = q[j * BS : (j + 1) * BS, i * BS : (i + 1) * BS].T
            acc = acc - hdot(mij, rows[j])
        rows.append(hdot(invs[i], acc))
    b = jnp.concatenate(rows, axis=0) if nb > 1 else rows[0]

    grad = outer(a, a) - outer(b, b)
    r = jax.lax.broadcasted_iota(jnp.int32, grad.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, grad.shape, 1)
    grad = jnp.where(r <= c, grad, 0.0)
    step0 = s_ref[0, 0] / (jnp.max(jnp.abs(grad)) + tiny)
    newq = q - step0 * dot(grad, q)
    out_ref[:] = newq

    if with_apply:
        # P' g = Q'^T (Q' g) of the UPDATED Q, still VMEM-resident
        (pre_ref,) = rest
        pre_ref[:] = dot(newq.T, dot(newq, g_ref[:]))


def _call(q, v, h, g, step, tiny, interpret, with_apply):
    """Shared launch: pads n to a 128 multiple with an identity diagonal
    extension (exact: padded probe entries are 0, so padded a/b rows are 0
    and the padded Q block is untouched)."""
    n = q.shape[0]
    np_ = _cdiv(n, BS) * BS
    if np_ > MAX_N:
        raise ValueError(f"fused dense update cap is n <= {MAX_N}")

    qp = q
    if np_ > n:
        qp = jnp.zeros((np_, np_), q.dtype).at[:n, :n].set(q)
        qp = qp + jnp.diag(
            jnp.concatenate([jnp.zeros((n,), q.dtype), jnp.ones((np_ - n,), q.dtype)])
        )
    pad_v = jnp.zeros((np_, BS), q.dtype).at[:n, 0].set(v)
    pad_h = jnp.zeros((np_, BS), q.dtype).at[:n, 0].set(h)
    pad_g = jnp.zeros((np_, 1), q.dtype)
    if with_apply:
        pad_g = pad_g.at[:n, 0].set(g)
    s = jnp.asarray(step, q.dtype).reshape(1, 1)

    out_shape = [jax.ShapeDtypeStruct((np_, np_), q.dtype)]
    if with_apply:
        out_shape.append(jax.ShapeDtypeStruct((np_, 1), q.dtype))
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel, nb=np_ // BS, tiny=tiny, with_apply=with_apply
        ),
        out_shape=tuple(out_shape),
        in_specs=[vm(), vm(), vm(), vm(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(vm() for _ in out_shape),
        # Q -> Q' in place (the dense_big r5 scan-carry-copy finding;
        # whole-array VMEM blocks make the alias unconditionally safe)
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(qp, pad_v, pad_h, pad_g, s)
    if with_apply:
        return out[0][:n, :n], out[1][:n, 0]
    return out[0][:n, :n]


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update(
    q: jax.Array,
    v: jax.Array,
    h: jax.Array,
    step: jax.Array | float,
    tiny: float,
    interpret: bool = False,
) -> jax.Array:
    """One-launch dense update; returns Q'."""
    return _call(q, v, h, None, step, tiny, interpret, False)


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update_apply(
    q: jax.Array,
    v: jax.Array,
    h: jax.Array,
    g: jax.Array,
    step: jax.Array | float,
    tiny: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One-launch dense update + P' g of the UPDATED Q; returns (Q', pre)."""
    return _call(q, v, h, g, step, tiny, interpret, True)
