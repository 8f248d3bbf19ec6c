"""Gridded large-n dense update — HBM-streaming Pallas stages.

The single-launch kernel (dense_upd.py) holds Q in VMEM and caps at
n <= MAX_N; the reference's own capacity guidance says the dense family is
worth using to ~1e4 parameters (ref README.md:54), where Q is hundreds of
MB and must stream from HBM. This kernel implements the same rank-2 update

  a = Q h,  b = Q^{-T} v
  step0 = step / (max|triu(a a^T - b b^T)| + tiny)
  Q' = Q - step0 * (a * S_a - b * S_b),   S_x[r, :] = sum_{j >= r} x_j Q[j, :]

in four streaming stages, touching Q exactly three times (2 reads +
1 read+write) — the O(n^2)-traffic minimum for this formulation:

  A (grid over row panels):    a_blk = Q_panel @ h            (read Q once)
  B (grid over column panels): forward block substitution for Q^T b = v;
      b accumulates in a VMEM scratch that persists across the grid
      (TPU grid steps run in order), so step j's panel^T b picks up
      exactly the already-solved prefix                       (read Q once)
  B2 (grid over row blocks):   exact max|triu(a a^T - b b^T)| computed
      from a, b alone — O(n^2) VPU flops but O(n) memory traffic
  C (grid over row panels, REVERSED index map): the reverse cumulative
      sums ride a running (1, n) scratch; the intra-panel part is ONE
      (B, B) upper-triangular-ones MXU matmul per panel
      (triu_ones @ (a_blk * Q_panel))            (read + write Q once)

Padding extends Q with an identity diagonal (exact: padded probe entries
are zero). Solves pin Precision.HIGHEST like every kernel in this package;
the statistical products stay default-precision.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psgd_tf_tpu.ops.pallas import tri as tri_mod
from psgd_tf_tpu.ops.pallas.tri import VMEM_LIMIT, _newton_inv

BLK = 256        # panel height/width (rows per grid step)
MAX_N = 16384    # (BLK, n) panels at n=16k are 16MB — a few fit in VMEM


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


# --------------------------------------------------------- stage A: a = Q h

def _matvec_kernel(q_ref, h_ref, a_ref):
    a_ref[:] = jnp.dot(
        q_ref[:], h_ref[:], preferred_element_type=jnp.float32
    )


# ------------------------------------------- stage B: solve Q^T b = v

def _solve_kernel(q_ref, v_ref, b_ref, bscr_ref, *, nb):
    """Grid step j: b_j = inv(Q_jj^T) (v_j - Q[:, jcols]^T b_prefix).

    q_ref streams the full (n, BLK) column panel; bscr holds b so far
    (zeros ahead of the frontier), so the panel^T-matvec needs no masking."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        bscr_ref[:] = jnp.zeros_like(bscr_ref)

    acc = v_ref[:] - jax.lax.dot_general(
        q_ref[:], bscr_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=tri_mod.SOLVE_PRECISION,
    )
    qjj = q_ref[pl.dslice(j * BLK, BLK), :]
    bj = jnp.dot(
        _newton_inv(qjj.T, BLK), acc,
        preferred_element_type=jnp.float32,
        precision=tri_mod.SOLVE_PRECISION,
    )
    bscr_ref[pl.dslice(j * BLK, BLK), :] = bj
    b_ref[:] = bj


# ----------------------- stage B2: exact max|triu(a a^T - b b^T)| from a, b

def _maxabs_kernel(acol_ref, bcol_ref, arow_ref, brow_ref, out_ref, *, n):
    i = pl.program_id(0)
    tile = acol_ref[:] * arow_ref[:] - bcol_ref[:] * brow_ref[:]
    rows = i * BLK + jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    m = jnp.max(jnp.where((rows <= cols) & (cols < n), jnp.abs(tile), 0.0))

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = jnp.maximum(out_ref[:], m)


# ------------------- stage C: Q' = Q - step0 (a * S_a - b * S_b), reversed

def _update_kernel(q_ref, acol_ref, bcol_ref, s_ref, newq_ref,
                   ta_ref, tb_ref, *, nb):
    """Row panels processed LAST to FIRST (reversed index map); ta/tb carry
    sum_{j in later panels} x_j Q[j, :]. Intra-panel reverse cumsum =
    upper-triangular-ones matmul."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ta_ref[:] = jnp.zeros_like(ta_ref)
        tb_ref[:] = jnp.zeros_like(tb_ref)

    q = q_ref[:]
    wa = acol_ref[:] * q                  # (BLK, n): a_j Q[j, :]
    wb = bcol_ref[:] * q
    r = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    triu_ones = jnp.where(r <= c, 1.0, 0.0)
    sa = jnp.dot(triu_ones, wa, preferred_element_type=jnp.float32) + ta_ref[:]
    sb = jnp.dot(triu_ones, wb, preferred_element_type=jnp.float32) + tb_ref[:]

    step0 = s_ref[0]
    newq_ref[:] = q - step0 * (acol_ref[:] * sa - bcol_ref[:] * sb)

    ta_ref[:] += jnp.sum(wa, axis=0, keepdims=True)
    tb_ref[:] += jnp.sum(wb, axis=0, keepdims=True)


# ------------------------------------------------------------------ wrapper

@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update(
    q: jax.Array,
    v: jax.Array,
    h: jax.Array,
    step: jax.Array | float,
    tiny: float,
    interpret: bool = False,
) -> jax.Array:
    """Gridded dense update for MAX_N >= n > dense_upd.MAX_N; returns Q'."""
    n = q.shape[0]
    np_ = _cdiv(n, BLK) * BLK
    if np_ > MAX_N:
        raise ValueError(f"gridded dense update cap is n <= {MAX_N}")
    nb = np_ // BLK
    f32 = jnp.float32

    qp = q
    if np_ > n:
        qp = jnp.zeros((np_, np_), f32).at[:n, :n].set(q)
        qp = qp + jnp.diag(
            jnp.concatenate([jnp.zeros((n,), f32), jnp.ones((np_ - n,), f32)])
        )
    vcol = jnp.zeros((np_, 1), f32).at[:n, 0].set(v)
    hcol = jnp.zeros((np_, 1), f32).at[:n, 0].set(h)

    row_panel = pl.BlockSpec((BLK, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col_panel = pl.BlockSpec((np_, BLK), lambda j: (0, j), memory_space=pltpu.VMEM)
    col_blk = pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full_col = pl.BlockSpec((np_, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    full_row = pl.BlockSpec((1, np_), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    # stage A: a = Q h
    acol = pl.pallas_call(
        _matvec_kernel,
        grid=(nb,),
        in_specs=[row_panel, full_col],
        out_specs=col_blk,
        out_shape=jax.ShapeDtypeStruct((np_, 1), f32),
        interpret=interpret,
        compiler_params=_params(),
    )(qp, hcol)

    # stage B: b = Q^{-T} v (sequential over column panels, VMEM carry)
    bcol = pl.pallas_call(
        functools.partial(_solve_kernel, nb=nb),
        grid=(nb,),
        in_specs=[col_panel, col_blk],
        out_specs=col_blk,
        out_shape=jax.ShapeDtypeStruct((np_, 1), f32),
        scratch_shapes=[pltpu.VMEM((np_, 1), f32)],
        interpret=interpret,
        compiler_params=_params(),
    )(qp, vcol)

    # stage B2: the exact step normalizer from a, b alone
    mx = pl.pallas_call(
        functools.partial(_maxabs_kernel, n=n),
        grid=(nb,),
        in_specs=[col_blk, col_blk, full_row, full_row],
        out_specs=rep((1, 1)),
        out_shape=jax.ShapeDtypeStruct((1, 1), f32),
        interpret=interpret,
        compiler_params=_params(),
    )(acol, bcol, acol.reshape(1, np_), bcol.reshape(1, np_))
    step0 = (jnp.asarray(step, f32) / (mx[0, 0] + tiny)).reshape(1)

    # stage C: reversed row panels, running reverse-cumsum carries
    rev_panel = pl.BlockSpec(
        (BLK, np_), lambda i: (nb - 1 - i, 0), memory_space=pltpu.VMEM
    )
    rev_blk = pl.BlockSpec(
        (BLK, 1), lambda i: (nb - 1 - i, 0), memory_space=pltpu.VMEM
    )
    newq = pl.pallas_call(
        functools.partial(_update_kernel, nb=nb),
        grid=(nb,),
        in_specs=[rev_panel, rev_blk, rev_blk,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=rev_panel,
        out_shape=jax.ShapeDtypeStruct((np_, np_), f32),
        scratch_shapes=[pltpu.VMEM((1, np_), f32), pltpu.VMEM((1, np_), f32)],
        interpret=interpret,
        compiler_params=_params(),
    )(qp, acol, bcol, step0)

    return newq[:n, :n]
