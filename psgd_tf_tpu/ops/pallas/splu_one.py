"""Single-launch VMEM-resident sparse-LU update (+ fused apply).

The streaming kernel (splu_upd.py) pays three full HBM passes over the
(r, n) factors because the step normalizer is a global max that must be
known before the factors can be rewritten. But at reference-scale ranks
(r ~ 10) the ENTIRE splu state fits in v5e's 128MB VMEM far beyond the
bench's n = 65536 (padded factors there are ~8.4MB): in that regime the
minimum-traffic schedule is one kernel that

  reads the state once (HBM -> VMEM),
  runs the full update algebra on-chip — the packed tail Gram (one MXU
  contraction carrying every rank-space reduction, same packing as
  splu_upd stage 1), the four r x r corner solves via exact Newton
  inverses (tri.py; TPU has no trsm), both exact max|grad| normalizers,
  and the factor rewrites —
  and writes the new state once.

With `g` it also computes P' g of the UPDATED state in the same launch
(a second small Gram over the new factors + rank-space projections),
which resolves the splu fused-update_apply regression recorded in
groups/splu.py:223-235: the streaming fusion lost because its stage-3
accumulator output serialized grid pipelining; resident, there is no grid
to serialize — measured v5e n=65536 r=10: 123us (5-launch streaming
update + XLA apply) -> 27.9us single launch (tail padding 1.0-filled so
the balance maxes need masked reductions, lane-iota masks only).

HBM traffic per update+apply: read 2(r,n)+vectors, write 2(r,n)+tails
(~19MB at n=65536) vs the 3-pass streaming schedule's ~31MB — which is
why bench.py's %-of-stream-bound for splu can legitimately exceed 100%
in this regime (same accounting note as the diag family).

Reference parity: update_precond_splu / precond_grad_splu
(/root/reference/preconditioned_stochastic_gradient_descent.py:396-524),
balancing applied up front exactly as ref :411-417 orders it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psgd_tf_tpu.ops.pallas import tri as tri_mod
from psgd_tf_tpu.ops.pallas.splu_upd import SUB, _tail_images

LANE = 128
VMEM_BUDGET = 72 * 2**20  # conservative live-bytes budget for fits()


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def fits(r: int, n: int) -> bool:
    """True when the whole update's working set fits the VMEM budget."""
    rp = max(SUB, _cdiv(r, SUB) * SUB)
    ntp = _cdiv(max(n - r, 1), LANE) * LANE
    # live high-water estimate: factors in+out (4 rp), the packed Gram Z
    # (3 rp + 8), apply Gram Z2 (2 rp + 8), ~2 (rp, ntp) outer-difference
    # temps, and ~12 (1, ntp) vectors
    live = (11 * rp + 28) * ntp * 4
    return live <= VMEM_BUDGET


def _dotg(a, b, dims):
    # statistical reductions at default MXU precision (matches splu_upd)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _kernel(l1_ref, u1_ref, l2t_ref, u2_ref, l3_ref, u3_ref,
            dx1_ref, dg1_ref, dx2_ref, dg2_ref, g1_ref, g2_ref, scal_ref,
            *out_refs, r, nt, rp, tiny, with_apply):
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, l3_ref.shape[1]), 1)
    tail_valid = lane < nt
    sub = jax.lax.broadcasted_iota(jnp.int32, (rp, 1), 0)

    # ---- balance (ref :411-417): rho from masked signed maxes, up front
    diag_l = jnp.sum(l1_ref[:] * tri_mod._eye(rp, f32), axis=1, keepdims=True)
    diag_u = jnp.sum(u1_ref[:] * tri_mod._eye(rp, f32), axis=1, keepdims=True)
    neg_inf = jnp.float32(-jnp.inf)
    max_l = jnp.maximum(
        jnp.max(jnp.where(sub < r, diag_l, neg_inf)),
        jnp.max(jnp.where(tail_valid, l3_ref[:], neg_inf)),
    )
    max_u = jnp.maximum(
        jnp.max(jnp.where(sub < r, diag_u, neg_inf)),
        jnp.max(jnp.where(tail_valid, u3_ref[:], neg_inf)),
    )
    rho = jnp.sqrt(max_l / max_u)
    inv_rho = 1.0 / rho

    L1 = l1_ref[:] * inv_rho      # identity pad scales too; Newton is exact
    U1 = u1_ref[:] * rho
    l2t = l2t_ref[:] * inv_rho
    u2 = u2_ref[:] * rho
    l3 = l3_ref[:] * inv_rho      # pad 1.0 -> inv_rho; w stays finite
    u3 = u3_ref[:] * rho
    dx2, dg2 = dx2_ref[:], dg2_ref[:]
    dx1, dg1 = dx1_ref[:], dg1_ref[:]

    # ---- packed tail Gram (splu_upd stage 1; one MXU contraction)
    lu = l3 * u3
    w = 1.0 / lu
    z = jnp.concatenate(
        [u2, l2t, u2 * w, dg2, dx2 * w, lu * dg2], axis=0
    )  # (3rp + 3, ntp); Mosaic pads partial tiles internally, no zero rows
    gram = _dotg(z, z, ((1,), (1,)))
    iu, il, iw = slice(0, rp), slice(rp, 2 * rp), slice(2 * rp, 3 * rp)
    idg, idx, ilug = 3 * rp, 3 * rp + 1, 3 * rp + 2

    U2_dg = gram[iu, idg:idg + 1]          # (rp, 1)  U2 dg2
    L2t_dxw = gram[il, idx:idx + 1]        # L2^T (w dx2)
    G_LU_w = gram[il, 2 * rp:3 * rp]       # L2^T diag(w) U2^T
    G_LL = gram[il, rp:2 * rp]             # L2^T L2
    L2t_lug = gram[il, ilug:ilug + 1]      # L2^T (l3 u3 dg2)
    G_UwUw = gram[iw, 2 * rp:3 * rp]       # U2 diag(w^2) U2^T
    U2_w2dx = gram[iw, idx:idx + 1]        # U2 diag(w^2) dx2

    # ---- corner solves: exact Newton inverses of the r x r blocks, BOTH
    # in one batched chain (the two sequential chains were back-to-back
    # dependent small-matmul latency; the latency rule from kron/dense)
    invs = tri_mod._newton_inv_batched(jnp.stack([L1, U1]))
    invL1, invU1 = invs[0], invs[1]
    hdot = functools.partial(
        jnp.dot, preferred_element_type=f32,
        precision=tri_mod.SOLVE_PRECISION,
    )

    # ---- corner algebra (ref :430-452); all (rp, 1) column vectors
    Ug1 = _dot(U1, dg1) + U2_dg
    Qg1 = _dot(L1, Ug1)
    iUtx1 = hdot(invU1.T, dx1)
    L2t_iqtx2 = L2t_dxw - _dot(G_LU_w, iUtx1)
    iQtx1 = hdot(invL1.T, iUtx1 - L2t_iqtx2)
    L2t_qg2 = _dot(G_LL, Ug1) + L2t_lug
    LtQg1 = _dot(L1.T, Qg1) + L2t_qg2
    Pg1 = _dot(U1.T, LtQg1)
    iLiQtx1 = hdot(invL1, iQtx1)
    U2_ipx2 = (U2_w2dx - _dot(G_UwUw, iUtx1)) - _dot(G_LU_w.T, iLiQtx1)
    iPx1 = hdot(invU1, iLiQtx1 - U2_ipx2)

    # ---- corner gradients (ref :455-460, :468-473)
    rr = jax.lax.broadcasted_iota(jnp.int32, (rp, rp), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (rp, rp), 1)
    outer = lambda x, y: x * y.T  # (rp,1),(rp,1) -> (rp,rp) VPU broadcast
    gl1 = jnp.where(rr >= cc, outer(Qg1, Qg1) - outer(iQtx1, iQtx1), 0.0)
    gu1 = jnp.where(rr <= cc, outer(Pg1, dg1) - outer(dx1, iPx1), 0.0)

    # ---- tail probe images + exact max|grad| for both factors
    coef = jnp.concatenate([Ug1, iUtx1, LtQg1, iLiQtx1], axis=1)  # (rp, 4)
    qg2, iqtx2, pg2, ipx2 = _tail_images(l2t, u2, l3, u3, dx2, dg2, coef)
    gl3 = qg2 * qg2 - iqtx2 * iqtx2        # pads are exactly 0
    gu3 = pg2 * dg2 - dx2 * ipx2
    gl2_max = jnp.max(jnp.abs(Qg1 * qg2 - iQtx1 * iqtx2))
    gu2_max = jnp.max(jnp.abs(Pg1 * dg2 - dx1 * ipx2))
    mx_l = jnp.maximum(jnp.max(jnp.abs(gl1)),
                       jnp.maximum(gl2_max, jnp.max(jnp.abs(gl3))))
    mx_u = jnp.maximum(jnp.max(jnp.abs(gu1)),
                       jnp.maximum(gu2_max, jnp.max(jnp.abs(gu3))))
    step = scal_ref[0, 0]
    sl = step / (mx_l + tiny)
    su = step / (mx_u + tiny)

    # ---- factor rewrites (balanced state; no output folding needed)
    newL1 = L1 - sl * _dot(gl1, L1)
    newU1 = U1 - su * _dot(U1, gu1)
    c1, c2 = _dot(L1.T, Qg1), _dot(L1.T, iQtx1)
    d1, d2 = _dot(U1, Pg1), _dot(U1, dx1)
    newl2t = l2t - sl * (c1 * qg2 - c2 * iqtx2) - sl * gl3 * l2t
    newu2 = u2 - su * (d1 * dg2 - d2 * ipx2) - su * gu3 * u2
    newl3 = l3 - sl * gl3 * l3
    newu3 = u3 - su * gu3 * u3

    if not with_apply:
        (newl1_ref, newu1_ref, newl2t_ref, newu2_ref,
         newl3_ref, newu3_ref) = out_refs
    else:
        (newl1_ref, newu1_ref, newl2t_ref, newu2_ref,
         newl3_ref, newu3_ref, pre1_ref, pre2_ref) = out_refs
    newl1_ref[:] = newL1
    newu1_ref[:] = newU1
    newl2t_ref[:] = newl2t
    newu2_ref[:] = newu2
    newl3_ref[:] = newl3
    newu3_ref[:] = newu3

    if with_apply:
        # ---- P' g of the UPDATED state (ref :506-516), second small Gram
        g1, g2 = g1_ref[:], g2_ref[:]
        lu_p = newl3 * newu3
        z2 = jnp.concatenate(
            [newu2, newl2t, lu_p * g2, g2], axis=0
        )  # (2rp + 2, ntp)
        gram2 = _dotg(z2, z2, ((1,), (1,)))
        il2 = slice(rp, 2 * rp)
        ilug2, ig2 = 2 * rp, 2 * rp + 1
        Ug1p = _dot(newU1, g1) + gram2[0:rp, ig2:ig2 + 1]
        Qg1p = _dot(newL1, Ug1p)
        LtQg1p = (
            _dot(newL1.T, Qg1p)
            + _dot(gram2[il2, rp:2 * rp], Ug1p)
            + gram2[il2, ilug2:ilug2 + 1]
        )
        pre1_ref[:] = _dot(newU1.T, LtQg1p)
        # tail of P' g (ref :506-516): VPU rank-space projections
        qg2p = jnp.sum(Ug1p * newl2t, axis=0, keepdims=True) + lu_p * g2
        pre2_ref[:] = (
            jnp.sum(LtQg1p * newu2, axis=0, keepdims=True) + lu_p * qg2p
        )


@functools.partial(
    jax.jit, static_argnames=("tiny", "interpret", "with_apply")
)
def _call(Lt, l3, U12, u3, v, h, g, step, tiny, interpret, with_apply):
    f32 = jnp.float32
    r, n = U12.shape
    nt = n - r
    # NO rank padding in HBM (Mosaic pads partial tiles in VMEM for free;
    # a sublane-rounded rp inflates tail traffic by rp/r and adds full
    # pad/unpad copies — the lesson measured on lra_upd)
    rp = r
    ntp = _cdiv(nt, LANE) * LANE

    def pad_corner(m, identity):
        # (r, r) -> (rp, rp) with identity diagonal extension
        if rp == r:
            return m
        out = jnp.zeros((rp, rp), f32).at[:r, :r].set(m)
        if identity:
            diag = jnp.concatenate(
                [jnp.zeros((r,), f32), jnp.ones((rp - r,), f32)]
            )
            out = out + jnp.diag(diag)
        return out

    def pad_rn(m):
        if (rp, ntp) == m.shape:
            return m
        return jnp.zeros((rp, ntp), f32).at[:r, :nt].set(m)

    def pad_n(x, fill=0.0):
        if ntp == x.shape[0]:
            return x[None, :]
        return jnp.full((1, ntp), fill, f32).at[0, :nt].set(x)

    def pad_r(x):
        return jnp.zeros((rp, 1), f32).at[:r, 0].set(x)

    L1 = pad_corner(Lt[:, :r].T, identity=True)
    U1 = pad_corner(U12[:, :r], identity=True)
    L2t, U2 = pad_rn(Lt[:, r:]), pad_rn(U12[:, r:])
    l3p, u3p = pad_n(l3, 1.0), pad_n(u3, 1.0)
    dx1, dg1 = pad_r(v[:r]), pad_r(h[:r])
    dx2, dg2 = pad_n(v[r:]), pad_n(h[r:])
    if with_apply:
        g1, g2 = pad_r(g[:r]), pad_n(g[r:])
    else:
        g1 = jnp.zeros((rp, 1), f32)
        g2 = jnp.zeros((1, ntp), f32)
    scal = jnp.asarray(step, f32).reshape(1, 1)

    out_shape = [
        jax.ShapeDtypeStruct((rp, rp), f32),   # newL1
        jax.ShapeDtypeStruct((rp, rp), f32),   # newU1
        jax.ShapeDtypeStruct((rp, ntp), f32),  # newL2t
        jax.ShapeDtypeStruct((rp, ntp), f32),  # newU2
        jax.ShapeDtypeStruct((1, ntp), f32),   # newl3
        jax.ShapeDtypeStruct((1, ntp), f32),   # newu3
    ]
    if with_apply:
        out_shape += [
            jax.ShapeDtypeStruct((rp, 1), f32),  # pre1
            jax.ShapeDtypeStruct((1, ntp), f32),  # pre2
        ]

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel, r=r, nt=nt, rp=rp, tiny=tiny, with_apply=with_apply
        ),
        out_shape=tuple(out_shape),
        in_specs=[vm() for _ in range(13)],
        out_specs=tuple(vm() for _ in out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=tri_mod.VMEM_LIMIT
        ),
    )(L1, U1, L2t, U2, l3p, u3p, dx1, dg1, dx2, dg2, g1, g2, scal)

    newL1, newU1, newL2t, newU2, newl3, newu3 = out[:6]
    Lt_out = jnp.concatenate([newL1[:r, :r].T, newL2t[:r, :nt]], axis=1)
    U12_out = jnp.concatenate([newU1[:r, :r], newU2[:r, :nt]], axis=1)
    result = (Lt_out, newl3[0, :nt], U12_out, newu3[0, :nt])
    if with_apply:
        pre = jnp.concatenate([out[6][:r, 0], out[7][0, :nt]])
        return result + (pre,)
    return result


def fused_update(Lt, l3, U12, u3, v, h, step, tiny: float,
                 interpret: bool = False, g=None):
    """One-launch resident splu update matching groups.splu.update exactly;
    with `g`, also returns P' g of the updated state (fused apply)."""
    return _call(
        Lt, l3, U12, u3, v, h,
        g if g is not None else jnp.zeros_like(v),
        jnp.asarray(step, jnp.float32), tiny, interpret, g is not None,
    )
