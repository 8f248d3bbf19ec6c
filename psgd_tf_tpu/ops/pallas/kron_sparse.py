"""Fused sparse-format Kronecker updates — one Pallas launch per layer.

The reference's NMT flagship assigns (scale, dense) / (norm, scale) /
(norm, dense) formats to most layers (ref :99-148); their XLA updates are
~10 tiny ops each and run dispatch-bound at reference-scale sides
(measured 46 us/step for the six sparse-format NMT layers on v5e — ~11%
of the whole training step). Each kernel below runs the ENTIRE update —
balancing, A, the closed-form arrow inverse (ref :222-232), the dense-side
block solves where present, both group gradients, max-abs normalizers, and
both factor updates — in one launch with everything VMEM-resident.

Layout: the arrow ("norm") factor travels as two (mp, 1) columns (diag,
bias); the scale factor as a (1, np) row; dense factors as identity-padded
(d, d) blocks (the same convention as kron_dd). "Last row/column"
interactions of the arrow factor are mask-weighted reductions against the
TRUE last index (padding never moves the arrow's bias column). m, n are
static (one compile per layer shape — layers compile once anyway).

Mirrors ((scale, dense), (scale, norm), (dense, norm)) transpose into
these at the dispatch site (groups/kron.py), same as the XLA paths.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psgd_tf_tpu.ops.pallas.tri import BS, VMEM_LIMIT
from psgd_tf_tpu.ops.pallas import tri as tri_mod
from psgd_tf_tpu.ops.pallas.kron_dd import (
    _diag_blocks_plain, _diag_blocks_t, _left_solve_t, _right_solve,
)

# single-launch VMEM budget: ~6 (mp, np) intermediates + dense factors
MAX_ELEMS = 512 * 512


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _row_iota(mp):
    return jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)


def _col_iota(np_):
    return jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)


def _masked_max(x, mask):
    return jnp.max(jnp.where(mask, x, -jnp.inf))


def _arrow_A(ql0c, ql1c, dG, m, mp):
    """Ql @ dG for the arrow factor: diag mult + bias-column pull of the
    TRUE last row (ref :218-219)."""
    last = _row_iota(mp) == m - 1
    dG_last = jnp.sum(jnp.where(last, dG, 0.0), axis=0, keepdims=True)
    return ql0c * dG + ql1c * dG_last


def _arrow_invT(ql0c, ql1c, dX, m, mp):
    """Ql^{-T} @ dX via the closed-form arrow inverse (ref :222-232)."""
    last = _row_iota(mp) == m - 1
    ql0_last = jnp.sum(jnp.where(last, ql0c, 0.0))
    corr = jnp.sum((ql1c / (ql0c * ql0_last)) * dX, axis=0, keepdims=True)
    return dX / ql0c - jnp.where(last, corr, 0.0)


def _arrow_grads(A, Bt, m, mp):
    """(grad1_diag (mp,1), grad1_bias (mp,1)) of the arrow factor
    (ref :235-240); padded and last-row bias entries are zero."""
    last = _row_iota(mp) == m - 1
    valid = _row_iota(mp) < m
    diag = jnp.sum(A * A - Bt * Bt, axis=1, keepdims=True)
    A_last = jnp.sum(jnp.where(last, A, 0.0), axis=0, keepdims=True)
    B_last = jnp.sum(jnp.where(last, Bt, 0.0), axis=0, keepdims=True)
    bias = jnp.sum(A * A_last - Bt * B_last, axis=1, keepdims=True)
    return jnp.where(valid, diag, 0.0), jnp.where(valid & ~last, bias, 0.0)


def _arrow_apply_update(ql0c, ql1c, diag, bias, step, tiny, m, mp):
    """ql <- ql - step1 * (arrow grad acting on ql) (ref :241-243)."""
    last = _row_iota(mp) == m - 1
    ql0_last = jnp.sum(jnp.where(last, ql0c, 0.0))
    mx = jnp.maximum(jnp.max(jnp.abs(diag)), jnp.max(jnp.abs(bias)))
    step1 = step / (mx + tiny)
    new0 = ql0c - step1 * diag * ql0c
    new1 = ql1c - step1 * (diag * ql1c + ql0_last * bias)
    return new0, new1


def _scale_update(A, Bt, qr, step, tiny, n, np_):
    """qr <- qr - step2 * grad2 * qr, grad2 = colsum(A*A - Bt*Bt)
    (ref :304-307); padded columns contribute zeros."""
    grad2 = jnp.sum(A * A - Bt * Bt, axis=0, keepdims=True)
    grad2 = jnp.where(_col_iota(np_) < n, grad2, 0.0)
    step2 = step / (jnp.max(jnp.abs(grad2)) + tiny)
    return qr - step2 * grad2 * qr


def _triu_mask(x):
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(r <= c, x, 0.0)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dott(a, b):  # a @ b^T
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _tdot(a, b):  # a^T @ b
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dense_triu_update(A, Bt, Q, step, tiny):
    """Q <- Q - step * triu(A A^T - Bt Bt^T) Q (identity-padded: padded
    rows of A/Bt are zero, so the gradient vanishes there)."""
    grad = _triu_mask(_dott(A, A) - _dott(Bt, Bt))
    s = step / (jnp.max(jnp.abs(grad)) + tiny)
    return Q - s * _dot(grad, Q)


# Each pair is split into a `_prep_*` (balance + the diagonal blocks its
# solves need inverted) and a `_finish_*` (everything after inversion), so
# the heterogeneous multi-layer launch (kron_multi.py) can hoist ALL
# layers' Newton inversions into ONE batched chain — the same latency rule
# as kron_dd (Mosaic does not interleave independent dependency chains).

# ----------------------------------------------------------- (norm, scale)

def _prep_ns(ql0c, ql1c, qr, m, n, mp, np_):
    """Balance (ref :341-346); no solve blocks (closed-form arrow inverse)."""
    rowv = _row_iota(mp) < m
    colv = _col_iota(np_) < n
    rho = jnp.sqrt(_masked_max(ql0c, rowv) / _masked_max(qr, colv))
    ql0c = jnp.where(rowv, ql0c / rho, 1.0)
    ql1c = ql1c / rho
    qr = jnp.where(colv, rho * qr, 1.0)
    return (ql0c, ql1c, qr), []


def _finish_ns(ql0c, ql1c, qr, dx, dg, invs, step, *, m, n, mp, np_, tiny):
    A = _arrow_A(ql0c, ql1c, dg, m, mp) * qr
    Bt = _arrow_invT(ql0c, ql1c, dx, m, mp) / qr
    diag, bias = _arrow_grads(A, Bt, m, mp)
    new0, new1 = _arrow_apply_update(ql0c, ql1c, diag, bias, step, tiny, m, mp)
    return new0, new1, _scale_update(A, Bt, qr, step, tiny, n, np_)


def _kernel_ns(ql0_ref, ql1_ref, qr_ref, dx_ref, dg_ref, s_ref,
               new0_ref, new1_ref, newqr_ref, *, m, n, mp, np_, tiny):
    (ql0c, ql1c, qr), _ = _prep_ns(
        ql0_ref[:], ql1_ref[:], qr_ref[:], m, n, mp, np_
    )
    new0_ref[:], new1_ref[:], newqr_ref[:] = _finish_ns(
        ql0c, ql1c, qr, dx_ref[:], dg_ref[:], [], s_ref[0, 0],
        m=m, n=n, mp=mp, np_=np_, tiny=tiny,
    )


# ----------------------------------------------------------- (dense, scale)

def _eye_mask(p):
    return jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (p, p), 1), 1.0, 0.0
    )


def _prep_ds(Ql, qr, m, n, mp, np_):
    rowv = _row_iota(mp) < m
    colv = _col_iota(np_) < n
    eye = _eye_mask(mp)
    diagQl = jnp.sum(Ql * eye, axis=1, keepdims=True)
    rho = jnp.sqrt(_masked_max(diagQl, rowv) / _masked_max(qr, colv))
    eye_rows = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0) >= m
    Ql = jnp.where(eye_rows, eye, Ql / rho)  # keep identity pad exact
    qr = jnp.where(colv, rho * qr, 1.0)
    return (Ql, qr), _diag_blocks_t(Ql, mp)


def _finish_ds(Ql, qr, dx, dg, invs_t, step, *, m, n, mp, np_, tiny):
    A = _dot(Ql, dg) * qr
    Bt = _left_solve_t(Ql, dx, mp // BS, invs_t) / qr
    return (
        _dense_triu_update(A, Bt, Ql, step, tiny),
        _scale_update(A, Bt, qr, step, tiny, n, np_),
    )


def _kernel_ds(ql_ref, qr_ref, dx_ref, dg_ref, s_ref,
               newql_ref, newqr_ref, *, m, n, mp, np_, tiny):
    (Ql, qr), blocks = _prep_ds(ql_ref[:], qr_ref[:], m, n, mp, np_)
    invs = tri_mod._newton_inv_batched(jnp.stack(blocks))
    newql_ref[:], newqr_ref[:] = _finish_ds(
        Ql, qr, dx_ref[:], dg_ref[:],
        [invs[i] for i in range(mp // BS)], s_ref[0, 0],
        m=m, n=n, mp=mp, np_=np_, tiny=tiny,
    )


# ----------------------------------------------------------- (norm, dense)

def _prep_nd(ql0c, ql1c, Qr, m, n, mp, np_):
    rowv = _row_iota(mp) < m
    eye = _eye_mask(np_)
    diagQr = jnp.sum(Qr * eye, axis=1, keepdims=True)
    colv = _row_iota(np_) < n
    rho = jnp.sqrt(_masked_max(ql0c, rowv) / _masked_max(diagQr, colv))
    ql0c = jnp.where(rowv, ql0c / rho, 1.0)
    ql1c = ql1c / rho
    eye_rows = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0) >= n
    Qr = jnp.where(eye_rows, eye, rho * Qr)
    return (ql0c, ql1c, Qr), _diag_blocks_plain(Qr, np_)


def _finish_nd(ql0c, ql1c, Qr, dx, dg, invs, step, *, m, n, mp, np_, tiny):
    A = _dott(_arrow_A(ql0c, ql1c, dg, m, mp), Qr)   # Ql dG Qr^T
    Bt = _right_solve(
        Qr, _arrow_invT(ql0c, ql1c, dx, m, mp), np_ // BS, invs
    )
    diag, bias = _arrow_grads(A, Bt, m, mp)
    new0, new1 = _arrow_apply_update(ql0c, ql1c, diag, bias, step, tiny, m, mp)
    grad2 = _triu_mask(_tdot(A, A) - _tdot(Bt, Bt))
    s2 = step / (jnp.max(jnp.abs(grad2)) + tiny)
    return new0, new1, Qr - s2 * _dot(grad2, Qr)


def _kernel_nd(ql0_ref, ql1_ref, qr_ref, dx_ref, dg_ref, s_ref,
               new0_ref, new1_ref, newqr_ref, *, m, n, mp, np_, tiny):
    (ql0c, ql1c, Qr), blocks = _prep_nd(
        ql0_ref[:], ql1_ref[:], qr_ref[:], m, n, mp, np_
    )
    invs = tri_mod._newton_inv_batched(jnp.stack(blocks))
    new0_ref[:], new1_ref[:], newqr_ref[:] = _finish_nd(
        ql0c, ql1c, Qr, dx_ref[:], dg_ref[:],
        [invs[j] for j in range(np_ // BS)], s_ref[0, 0],
        m=m, n=n, mp=mp, np_=np_, tiny=tiny,
    )


# ------------------------------------------------------------------ wrappers

def _pad_probe(x, mp, np_):
    m, n = x.shape
    if (m, n) == (mp, np_):
        return x
    return jnp.zeros((mp, np_), x.dtype).at[:m, :n].set(x)


def _pad_arrow(ql, mp):
    """(2, m) arrow rows -> two (mp, 1) columns, diag padded with 1."""
    m = ql.shape[1]
    ql0 = jnp.ones((mp, 1), ql.dtype).at[:m, 0].set(ql[0])
    ql1 = jnp.zeros((mp, 1), ql.dtype).at[:m, 0].set(ql[1])
    return ql0, ql1


def _pad_scale(q, np_):
    n = q.shape[0]
    if n == np_:
        return q[None, :]
    return jnp.ones((1, np_), q.dtype).at[0, :n].set(q)


def _pad_dense(q, p):
    d = q.shape[0]
    if p == d:
        return q
    out = jnp.zeros((p, p), q.dtype).at[:d, :d].set(q)
    return out + jnp.diag(
        jnp.concatenate([jnp.zeros((d,), q.dtype), jnp.ones((p - d,), q.dtype)])
    )


def fits(m: int, n: int) -> bool:
    mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS
    return mp * np_ <= MAX_ELEMS and max(mp, np_) <= 512


def _call(kernel, factor_args, out_shapes, dx, dg, step, tiny, m, n,
          mp, np_, interpret):
    s = jnp.asarray(step, jnp.float32).reshape(1, 1)
    n_in = len(factor_args) + 2
    return pl.pallas_call(
        functools.partial(kernel, m=m, n=n, mp=mp, np_=np_, tiny=tiny),
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(*factor_args, _pad_probe(dx, mp, np_), _pad_probe(dg, mp, np_), s)


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update_ns(ql, qr, dx, dg, step, tiny: float, interpret: bool = False):
    """(norm, scale) fused update. ql: (2, m), qr: (n,)."""
    m, n = dx.shape
    mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS
    ql0, ql1 = _pad_arrow(ql, mp)
    new0, new1, newqr = _call(
        _kernel_ns, (ql0, ql1, _pad_scale(qr, np_)),
        (
            jax.ShapeDtypeStruct((mp, 1), ql.dtype),
            jax.ShapeDtypeStruct((mp, 1), ql.dtype),
            jax.ShapeDtypeStruct((1, np_), qr.dtype),
        ),
        dx, dg, step, tiny, m, n, mp, np_, interpret,
    )
    return jnp.stack([new0[:m, 0], new1[:m, 0]]), newqr[0, :n]


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update_ds(Ql, qr, dx, dg, step, tiny: float, interpret: bool = False):
    """(dense, scale) fused update. Ql: (m, m) upper-tri, qr: (n,)."""
    m, n = dx.shape
    mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS
    newql, newqr = _call(
        _kernel_ds, (_pad_dense(Ql, mp), _pad_scale(qr, np_)),
        (
            jax.ShapeDtypeStruct((mp, mp), Ql.dtype),
            jax.ShapeDtypeStruct((1, np_), qr.dtype),
        ),
        dx, dg, step, tiny, m, n, mp, np_, interpret,
    )
    return newql[:m, :m], newqr[0, :n]


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update_nd(ql, Qr, dx, dg, step, tiny: float, interpret: bool = False):
    """(norm, dense) fused update. ql: (2, m), Qr: (n, n) upper-tri."""
    m, n = dx.shape
    mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS
    ql0, ql1 = _pad_arrow(ql, mp)
    new0, new1, newqr = _call(
        _kernel_nd, (ql0, ql1, _pad_dense(Qr, np_)),
        (
            jax.ShapeDtypeStruct((mp, 1), ql.dtype),
            jax.ShapeDtypeStruct((mp, 1), ql.dtype),
            jax.ShapeDtypeStruct((np_, np_), Qr.dtype),
        ),
        dx, dg, step, tiny, m, n, mp, np_, interpret,
    )
    return jnp.stack([new0[:m, 0], new1[:m, 0]]), newqr[:n, :n]
