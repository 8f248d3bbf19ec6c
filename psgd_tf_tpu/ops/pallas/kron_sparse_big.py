"""Gridded sparse-format Kronecker updates — reference capacity envelope.

The resident kernels (kron_sparse.py) cap at 512x512 probes; the
reference's own capacity table targets (norm, dense) to [1e6, 1e3] and
(norm, scale) to [1e6, 1e6] (ref README.md:54) — embedding/vocab-scale
layers whose probes must STREAM from HBM. The key structural facts this
module exploits:

  * A and Bt are invariant under the L/R balancing (Ql/rho, rho*Qr leaves
    Ql dG Qr^T and Ql^{-T} dX Qr^{-1} unchanged), and the factor state is
    O(m + n) (plus one small dense factor), so the O(mn) work is PURE
    REDUCTION: one streaming pass over (dX, dG) emits every row-gradient,
    column-gradient, bias, and dense-side Gram the update needs; the
    factor rewrites are cheap XLA on the outputs.
  * The arrow ("norm") factor's closed-form inverse couples every row into
    the LAST row of Bt through corr_j = sum_i w_i dX_ij (ref :222-232).
    corr is itself one of the streamed reductions; the last row's
    contributions to the gradients are O(n) post-processing, EXCEPT the
    bias term sum_j Bt_ij B_last_j, which needs one extra dX matvec after
    corr is known (XLA, memory-bound). Total probe traffic: dG once, dX
    twice — 3mn vs the 2mn lower bound; a single-pass schedule is
    impossible because corr gates B_last which gates the bias reduction.
  * Dense-side solves stream per panel against diagonal-block Newton
    inverses computed ONCE into kernel scratch at grid step 0 (tri.py;
    TPU has no trsm).

Measured bound accounting for the nd kernel (r4 ablation, r5 routing
change): block shape is flat — PANEL_BYTES 1/2/4/8 MB measured
221/241/224/228 GB/s (r4) — and the binder is the in-kernel solve
GEMM's precision. r4 pinned the HIGHEST-vs-DEFAULT gap (~30% of the
update) and kept HIGHEST because Mosaic exposes no HIGH middle ground;
r5 implements that middle ground MANUALLY (bf16x3 hi/lo-split product,
see SOLVE_MODE below) and A/B shows it matches HIGHEST's accuracy to
three digits while recovering most of DEFAULT's speed — bf16x3 is now
routed for both nd and ds. The r5 lever sweeps also refuted block
shape for ds (blk 256..2048: 266-288 GB/s) and for the wide ns path
(lane {16k,32k,64k} x rows {8..128}: 284-298 GB/s — the binder there
is the XLA row-sweep half of the 4mn schedule, not kernel geometry).

The (dense, scale) pair has no arrow coupling and streams in ONE pass
(2mn, the bound). Mirrors transpose in at the dispatch site
(groups/kron.py) exactly as the resident kernels.

Reference parity: _update_precond_{norm_dense,dense_scale,norm_scale},
/root/reference/preconditioned_stochastic_gradient_descent.py:198-369.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psgd_tf_tpu.ops import linalg
from psgd_tf_tpu.ops.pallas import tri as tri_mod
from psgd_tf_tpu.ops.pallas.tri import BS, VMEM_LIMIT

MAX_LANES = 131072    # padded minor-axis cap for the 1-D-grid ns kernel:
                      # (1, np) factor rows and the rep-mapped accumulators
                      # stay ~0.5MB each in VMEM; the row-panel grid still
                      # streams the O(mn) probes
LANE_BLK = 32768      # lane-panel width of the WIDE ns path's 2-D grid
WIDE2_MAX_LANES = 2 << 20  # cap for the single-pass wide kernel
                      # (_kernel_ns_wide2): it keeps 2 full-width (1, np)
                      # accumulator outputs + 3 lane rows VMEM-resident
                      # (~8MB + 12MB re-fetched at 2M lanes) next to the
                      # 32MB of double-buffered probe blocks; wider scale
                      # sides fall back to the XLA-sweep wide path
WIDE2_BLK = 64        # row-panel height of the single-pass wide kernel
MAX_LANES_NS = 1 << 23  # wide-path sanity cap: nothing lane-sized is
                      # VMEM-resident, so the scale side reaches the
                      # reference's [1e6, 1e6] guidance (ref README.md:54);
                      # the m x n probe itself (HBM) is the real limiter
MAX_DENSE = 1024      # dense-factor side cap (matches kron_dd.MAX_SIDE)
PANEL_BYTES = 2 << 20  # target panel size per streamed input


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _blk_major(minor: int) -> int:
    """Rows (or cols) per grid step: ~PANEL_BYTES fp32 panels, 8-aligned."""
    b = PANEL_BYTES // (4 * minor)
    return int(max(8, min(1024, (b // 8) * 8)))


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


# In-kernel solve-GEMM mode for the gridded nd/ds substitutions. Mosaic
# exposes no Precision.HIGH (it crashes lowering, tri.py:36-38), so the
# bf16x3 middle ground is implemented MANUALLY below (VERDICT r4 ask #2):
# split each fp32 operand into hi + lo bf16 halves and take the 3 cross
# products (dropping lo*lo, whose magnitude is below fp32 rounding) — 3
# MXU passes instead of HIGHEST's 6 or DEFAULT's 1.
#
# A/B on the real chip (r5, /tmp/r5/nd_bf16x3_ab.py: update+apply pair
# via groups dispatch, chained slopes, arms alternated over two rounds,
# medians; accuracy = one update vs the kernels-off XLA oracle):
#
#   nd (131072, 512)   us/pair  GB/s eff   qr oracle rel
#     highest            5604     239        6.79e-7
#     bf16x3             4936     272        6.80e-7   <- routed
#     default            4568     294        3.55e-5   (52x worse)
#   ds (512, 131072)   us/pair  GB/s eff   ql oracle rel
#     highest            3806     282        4.33e-5
#     bf16x3             3007     357        4.32e-5   <- routed
#     default            2542     422        (qr 1.61e-5, 245x worse)
#
# (Absolute us/pair above carry the pre-correction harness's constant
# +3x-probe-copy overhead — bench.py r5 note; all arms share it, so the
# relative ordering and the routing decision stand. Corrected-harness
# row values live in BENCH_r05.)
#
# bf16x3 is ROUTED (r5): its accuracy is indistinguishable from HIGHEST
# at every measured shape — the substitution's error is dominated by
# operand rounding, which the hi/lo split captures exactly — while it
# recovers 57-66% of the HIGHEST->DEFAULT speed gap (nd 12%, ds 21%
# faster pairs). This does NOT relax the solve-precision invariant
# (CLAUDE.md): bf16x3 IS an error-free-fp32-operand product like
# HIGHEST, just without the 3 passes whose contribution lies below fp32
# rounding. The Newton inverses (tri.py) keep HIGHEST — they are
# O(BS^3), off the streaming path, and their mixed schedule already
# runs all-but-last-iteration at default.
SOLVE_MODE = "bf16x3"  # "highest" | "bf16x3" | "default"


def _solve_dot(a, b):
    """a @ b for the in-kernel block substitutions at the SOLVE_MODE
    precision (see module comment above)."""
    if SOLVE_MODE == "highest":
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=tri_mod.SOLVE_PRECISION)
    if SOLVE_MODE == "default":
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return tri_mod.dot_bf16x3(a, b)


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


def fits_grid(kind: str, m: int, n: int) -> bool:
    """Shapes the streaming kernels accept (beyond kron_sparse.fits)."""
    if kind == "ns":    # lanes resident (1-D grid) or streamed (wide path)
        return _cdiv(n, 128) * 128 <= MAX_LANES_NS
    if kind == "nd":    # arrow rows stream; dense factor resident
        return n <= MAX_DENSE
    if kind == "ds":    # scale cols stream; dense factor resident
        return m <= MAX_DENSE
    raise ValueError(kind)


# ---------------------------------------------------------------- (norm, *)

def _kernel_ns_big(dx_ref, dg_ref, ql0_ref, ql1_ref, w_ref, qr_ref,
                   dgl_ref, al_ref,
                   diag_ref, biasa_ref, corr_ref, colsum_ref, *, m, blk):
    i = pl.program_id(0)
    rows = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    mask = rows != (m - 1)  # last row's stats are patched in XLA post
    dx = dx_ref[:]
    dxm = jnp.where(mask, dx, 0.0)
    dgm = jnp.where(mask, dg_ref[:], 0.0)
    qr = qr_ref[:]
    a = (ql0_ref[:] * dgm + ql1_ref[:] * dgl_ref[:]) * qr
    bt = dxm / ql0_ref[:] / qr
    d2 = a * a - bt * bt
    diag_ref[:] = jnp.sum(d2, axis=1, keepdims=True)
    biasa_ref[:] = jnp.sum(a * al_ref[:], axis=1, keepdims=True)

    @pl.when(i == 0)
    def _():
        corr_ref[:] = jnp.zeros_like(corr_ref)
        colsum_ref[:] = jnp.zeros_like(colsum_ref)

    corr_ref[:] += jnp.sum(w_ref[:] * dx, axis=0, keepdims=True)
    colsum_ref[:] += jnp.sum(d2, axis=0, keepdims=True)


def _kernel_ns_wide2(dx_ref, dg_ref, ql0_ref, ql1_ref, w_ref, qr_ref,
                     dgl_ref, al_ref,
                     diag_ref, biasa_ref, corr_ref, colsum_ref,
                     *, m, n, blk, lblk):
    """ALL FOUR (norm, scale) update accumulators in ONE 2mn pass for
    wide scale sides — the r5 successor to the XLA-sweep wide path.

    Grid: row panels OUTER (i), lane panels INNER (j). The row-space
    outputs (diag, biasa) are (blk, 1) blocks of (mp, 1) arrays mapped
    to i — legal (minor block dim equals the whole array dim, unlike
    the (blk, 1)-over-(mp, nj) layout that failed on hardware r4) and
    revisited CONSECUTIVELY across the inner lane sweep. The lane-space
    accumulators (corr, colsum) are FULL-WIDTH (1, np) outputs mapped
    to a constant block — VMEM-resident for the whole launch (4 MB per
    1M lanes; the route caps at WIDE2_MAX_LANES to respect the scoped
    budget), written back once. This removes the old wide path's
    separate XLA sweep over (dX, dG) (multi-consumer (m, n)
    intermediates XLA materializes). Together with the pad-free
    contract below, the harness-corrected (512, 1e6) update+apply pair
    went 32.4 -> 15.9 ms (2.0x), with BOTH halves at the ~660 GB/s
    mixed law.

    PAD-FREE (measured r5: `_pad_cols` on a (512, 1e6) probe pair is a
    full 8 GB of copy traffic per update — n is essentially never a
    lane-block multiple): the probes arrive UNPADDED; ragged edge blocks
    are masked in-kernel (invalid rows/lanes forced to inert values
    BEFORE any division so no NaN can form), with Mosaic materializing
    partial edge tiles for free (CLAUDE.md layout rule)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    lanes = j * lblk + jax.lax.broadcasted_iota(jnp.int32, (1, lblk), 1)
    rowv = rows < m
    lanev = lanes < n
    valid = rowv & lanev
    maskv = valid & (rows != m - 1)  # arrow row patched in XLA post
    ql0 = jnp.where(rowv, ql0_ref[:], 1.0)
    qr = jnp.where(lanev, qr_ref[:], 1.0)
    dx = jnp.where(valid, dx_ref[:], 0.0)
    dxm = jnp.where(maskv, dx_ref[:], 0.0)
    dgm = jnp.where(maskv, dg_ref[:], 0.0)
    ql1 = jnp.where(rowv, ql1_ref[:], 0.0)
    w = jnp.where(rowv, w_ref[:], 0.0)
    dgl = jnp.where(lanev, dgl_ref[:], 0.0)
    al = jnp.where(lanev, al_ref[:], 0.0)
    a = (ql0 * dgm + ql1 * dgl) * qr
    a = jnp.where(maskv, a, 0.0)
    bt = dxm / ql0 / qr
    d2 = a * a - bt * bt

    @pl.when(j == 0)
    def _():  # fresh row panel: reset its row-space accumulators
        diag_ref[:] = jnp.zeros_like(diag_ref)
        biasa_ref[:] = jnp.zeros_like(biasa_ref)

    diag_ref[:] += jnp.sum(d2, axis=1, keepdims=True)
    biasa_ref[:] += jnp.sum(a * al, axis=1, keepdims=True)

    @pl.when((i == 0) & (j == 0))
    def _():
        corr_ref[:] = jnp.zeros_like(corr_ref)
        colsum_ref[:] = jnp.zeros_like(colsum_ref)

    lane = pl.dslice(j * lblk, lblk)
    corr_ref[0, lane] += jnp.sum(w * dx, axis=0)
    colsum_ref[0, lane] += jnp.sum(d2, axis=0)


def _kernel_ns_wide(dx_ref, dg_ref, ql0_ref, ql1_ref, w_ref, qr_ref,
                    dgl_ref, corr_ref, colsum_ref, *, m, blk):
    """Lane-space accumulators for the WIDE (norm, scale) update.

    2-D grid: lane panels OUTER (j), row panels INNER (i), so the (1, lblk)
    corr/colsum blocks (mapped to j) stay VMEM-resident across the whole
    inner row sweep — consecutive grid steps, init at i == 0. Row-space
    reductions (diag, biasa) are NOT computed here: Mosaic rejects their
    natural (blk, 1)-over-(mp, nj) partial layout (minor block dim must be
    128-divisible or whole; verified on-chip r4), and every alternative
    either re-visits an output block non-consecutively or keeps something
    lane-sized resident. They fold into the XLA sweep the algorithm
    already needs after corr (see fused_update_ns) — total traffic 4mn
    (kernel dX+dG, XLA dX+dG) vs the resident path's 3mn."""
    i = pl.program_id(1)
    rows = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    mask = rows != (m - 1)  # last row's stats are patched in XLA post
    dx = dx_ref[:]
    dxm = jnp.where(mask, dx, 0.0)
    dgm = jnp.where(mask, dg_ref[:], 0.0)
    qr = qr_ref[:]
    a = (ql0_ref[:] * dgm + ql1_ref[:] * dgl_ref[:]) * qr
    bt = dxm / ql0_ref[:] / qr

    @pl.when(i == 0)
    def _():
        corr_ref[:] = jnp.zeros_like(corr_ref)
        colsum_ref[:] = jnp.zeros_like(colsum_ref)

    corr_ref[:] += jnp.sum(w_ref[:] * dx, axis=0, keepdims=True)
    colsum_ref[:] += jnp.sum(a * a - bt * bt, axis=0, keepdims=True)


def _kernel_nd_big(dx_ref, dg_ref, ql0_ref, ql1_ref, w_ref, qr_ref,
                   dgl_ref, al_ref,
                   diag_ref, biasa_ref, corr_ref, grama_ref, gramb_ref,
                   invs_ref, *, m, blk, nbq):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # diagonal-block Newton inverses of Qr, once per launch
        invs_ref[:] = tri_mod._newton_inv_batched(
            jnp.stack([
                qr_ref[j * BS:(j + 1) * BS, j * BS:(j + 1) * BS]
                for j in range(nbq)
            ])
        )
        corr_ref[:] = jnp.zeros_like(corr_ref)
        grama_ref[:] = jnp.zeros_like(grama_ref)
        gramb_ref[:] = jnp.zeros_like(gramb_ref)

    rows = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    mask = rows != (m - 1)
    dx = dx_ref[:]
    dxm = jnp.where(mask, dx, 0.0)
    dgm = jnp.where(mask, dg_ref[:], 0.0)
    qr = qr_ref[:]

    a = _dott(ql0_ref[:] * dgm + ql1_ref[:] * dgl_ref[:], qr)  # ... @ Qr^T
    # bt = (dxm / ql0) @ Qr^{-1}: forward block substitution over columns
    btm = dxm / ql0_ref[:]
    cols = []
    for j in range(nbq):
        acc = btm[:, j * BS:(j + 1) * BS]
        for k in range(j):
            acc = acc - _solve_dot(
                cols[k], qr[k * BS:(k + 1) * BS, j * BS:(j + 1) * BS]
            )
        cols.append(_solve_dot(acc, invs_ref[j]))
    bt = jnp.concatenate(cols, axis=1) if nbq > 1 else cols[0]

    diag_ref[:] = jnp.sum(a * a - bt * bt, axis=1, keepdims=True)
    biasa_ref[:] = jnp.sum(a * al_ref[:], axis=1, keepdims=True)
    corr_ref[:] += jnp.sum(w_ref[:] * dx, axis=0, keepdims=True)
    grama_ref[:] += _tdot(a, a)
    gramb_ref[:] += _tdot(bt, bt)


def _norm_post(ql0, ql1, diag, bias, grad2_mx, step, tiny, qr_is_scale,
               qr, grad2):
    """Shared arrow + right-factor rewrites (identical to groups/kron.py's
    _update_ns/_update_nd tails)."""
    step1 = step / (jnp.maximum(jnp.max(jnp.abs(diag)),
                                jnp.max(jnp.abs(bias))) + tiny)
    new0 = ql0 - step1 * diag * ql0
    new1 = ql1 - step1 * (diag * ql1 + ql0[-1] * bias)
    step2 = step / (grad2_mx + tiny)
    if qr_is_scale:
        newqr = qr - step2 * grad2 * qr
    else:
        newqr = qr - step2 * (grad2 @ qr)
    return jnp.stack([new0, new1]), newqr


def _pad_cols(x, np_, fill=0.0):
    n = x.shape[-1]
    if n == np_:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, np_ - n)]
    return jnp.pad(x, pad, constant_values=fill)


def _pad_rows_blk(x, mp, fill=0.0):
    m = x.shape[0]
    if m == mp:
        return x
    return jnp.pad(x, [(0, mp - m)] + [(0, 0)] * (x.ndim - 1),
                   constant_values=fill)


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update_ns(ql, qr, dX, dG, step, tiny: float,
                    interpret: bool = False):
    """(norm, scale) streaming update for arbitrary m AND n; ql: (2, m),
    qr: (n,).

    Lanes <= MAX_LANES: one gridded pass over (dX, dG) + one XLA dX matvec
    (see module docstring for why the bias term forces it). Wider scale
    sides route to the 2-D-grid wide path (_kernel_ns_wide)."""
    f32 = jnp.float32
    m, n = dX.shape
    np_ = _cdiv(n, 128) * 128
    if np_ > MAX_LANES:
        return _fused_update_ns_wide(ql, qr, dX, dG, step, tiny, interpret)
    blk = _blk_major(np_)
    mp = _cdiv(m, blk) * blk
    step = jnp.asarray(step, f32)

    # balance (ref :341-346)
    rho = jnp.sqrt(jnp.max(ql[0]) / jnp.max(qr))
    ql = ql / rho
    qr_b = rho * qr
    ql0, ql1 = ql[0], ql[1]

    dX_last, dG_last = dX[-1], dG[-1]
    A_last = ql0[-1] * dG_last * qr_b                     # (n,)
    w = ql1 / (ql0 * ql0[-1])                             # w[-1] = 0

    row1 = lambda x, fill: _pad_cols(x[None, :], np_, fill)
    colb = lambda x, fill: _pad_rows_blk(x[:, None], mp, fill)
    rowspec = pl.BlockSpec((blk, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vecspec = pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    diag0, biasa, corr, colsum = pl.pallas_call(
        functools.partial(_kernel_ns_big, m=m, blk=blk),
        grid=(mp // blk,),
        in_specs=[rowspec, rowspec, vecspec, vecspec, vecspec,
                  rep((1, np_)), rep((1, np_)), rep((1, np_))],
        out_specs=(vecspec, vecspec, rep((1, np_)), rep((1, np_))),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 1), f32),
            jax.ShapeDtypeStruct((mp, 1), f32),
            jax.ShapeDtypeStruct((1, np_), f32),
            jax.ShapeDtypeStruct((1, np_), f32),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(
        _pad_rows_blk(_pad_cols(dX, np_), mp),
        _pad_rows_blk(_pad_cols(dG, np_), mp),
        colb(ql0, 1.0), colb(ql1, 0.0), colb(w, 0.0),
        row1(qr_b, 1.0), row1(dG_last, 0.0), row1(A_last, 0.0),
    )

    corr = corr[0, :n]
    B_last = (dX_last / ql0[-1] - corr) / qr_b
    diag = diag0[:m, 0].at[m - 1].set(jnp.sum(A_last**2 - B_last**2))
    btdot = (dX @ (B_last / qr_b)) / ql0                  # the second dX pass
    bias = (biasa[:m, 0] - btdot).at[m - 1].set(0.0)
    grad2 = colsum[0, :n] + A_last**2 - B_last**2
    return _norm_post(ql0, ql1, diag, bias, jnp.max(jnp.abs(grad2)),
                      step, tiny, True, qr_b, grad2)


def _fused_update_ns_wide(ql, qr, dX, dG, step, tiny: float,
                          interpret: bool = False):
    """(norm, scale) update for scale sides past MAX_LANES (the
    reference's [1e6, 1e6] regime, README.md:54). Dispatch: the
    single-pass wide kernel (_kernel_ns_wide2 — all four accumulators in
    one 2mn sweep, lane accumulators VMEM-resident) up to
    WIDE2_MAX_LANES; beyond that the r4 XLA-sweep path."""
    np128 = _cdiv(dX.shape[1], 128) * 128
    if np128 <= WIDE2_MAX_LANES:
        return _fused_update_ns_wide2(ql, qr, dX, dG, step, tiny, interpret)
    return _fused_update_ns_wide_xla(ql, qr, dX, dG, step, tiny, interpret)


def _fused_update_ns_wide2(ql, qr, dX, dG, step, tiny: float,
                           interpret: bool = False):
    """Single-pass wide (norm, scale) update (see _kernel_ns_wide2).
    Only the bias term's dX matvec (gated by corr) and the O(m + n)
    factor rewrites remain in XLA — total schedule 3mn like the
    resident-lane 1-D path, vs the XLA-sweep wide path's 4mn-plus-
    materialized-temporaries. The probes are passed UNPADDED (edge
    blocks masked in-kernel): lane-padding a (512, 1e6) probe pair was
    8 GB of pure copy traffic per update."""
    f32 = jnp.float32
    m, n = dX.shape
    lblk = min(_cdiv(n, 128) * 128, LANE_BLK)
    np_ = _cdiv(n, lblk) * lblk
    blk = WIDE2_BLK
    mp = _cdiv(m, blk) * blk
    step = jnp.asarray(step, f32)

    # balance (ref :341-346)
    rho = jnp.sqrt(jnp.max(ql[0]) / jnp.max(qr))
    ql = ql / rho
    qr_b = rho * qr
    ql0, ql1 = ql[0], ql[1]

    dX_last, dG_last = dX[-1], dG[-1]
    A_last = ql0[-1] * dG_last * qr_b                     # (n,)
    w = ql1 / (ql0 * ql0[-1])                             # w[-1] = 0

    rowspec = pl.BlockSpec((blk, lblk), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    vecspec = pl.BlockSpec((blk, 1), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    lanespec = pl.BlockSpec((1, lblk), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    outvec = pl.BlockSpec((blk, 1), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    fullrow = pl.BlockSpec((1, np_), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    diag0, biasa, corr, colsum = pl.pallas_call(
        functools.partial(_kernel_ns_wide2, m=m, n=n, blk=blk, lblk=lblk),
        grid=(_cdiv(m, blk), _cdiv(n, lblk)),
        in_specs=[rowspec, rowspec, vecspec, vecspec, vecspec,
                  lanespec, lanespec, lanespec],
        out_specs=(outvec, outvec, fullrow, fullrow),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 1), f32),
            jax.ShapeDtypeStruct((mp, 1), f32),
            jax.ShapeDtypeStruct((1, np_), f32),
            jax.ShapeDtypeStruct((1, np_), f32),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(
        dX, dG,
        ql0[:, None], ql1[:, None], w[:, None],
        qr_b[None, :], dG_last[None, :], A_last[None, :],
    )

    corr = corr[0, :n]
    B_last = (dX_last / ql0[-1] - corr) / qr_b
    diag = diag0[:m, 0].at[m - 1].set(jnp.sum(A_last**2 - B_last**2))
    btdot = (dX @ (B_last / qr_b)) / ql0                  # the second dX pass
    bias = (biasa[:m, 0] - btdot).at[m - 1].set(0.0)
    grad2 = colsum[0, :n] + A_last**2 - B_last**2
    return _norm_post(ql0, ql1, diag, bias, jnp.max(jnp.abs(grad2)),
                      step, tiny, True, qr_b, grad2)


def _fused_update_ns_wide_xla(ql, qr, dX, dG, step, tiny: float,
                              interpret: bool = False):
    """The r4 XLA-sweep wide path — retained for scale sides past
    WIDE2_MAX_LANES (where the single-pass kernel's resident lane
    accumulators no longer fit the scoped-VMEM budget). The 2-D-grid
    kernel streams (dX, dG) once for the lane-space accumulators; the
    row-space reductions ride the XLA sweep that corr gates anyway
    (see _kernel_ns_wide)."""
    f32 = jnp.float32
    m, n = dX.shape
    lblk = min(_cdiv(n, 128) * 128, LANE_BLK)
    np_ = _cdiv(n, lblk) * lblk
    blk = _blk_major(lblk)
    mp = _cdiv(m, blk) * blk
    step = jnp.asarray(step, f32)

    # balance (ref :341-346)
    rho = jnp.sqrt(jnp.max(ql[0]) / jnp.max(qr))
    ql = ql / rho
    qr_b = rho * qr
    ql0, ql1 = ql[0], ql[1]

    dX_last, dG_last = dX[-1], dG[-1]
    A_last = ql0[-1] * dG_last * qr_b                     # (n,)
    w = ql1 / (ql0 * ql0[-1])                             # w[-1] = 0

    colb = lambda x, fill: _pad_rows_blk(x[:, None], mp, fill)
    rowspec = pl.BlockSpec((blk, lblk), lambda j, i: (i, j),
                           memory_space=pltpu.VMEM)
    vecspec = pl.BlockSpec((blk, 1), lambda j, i: (i, 0),
                           memory_space=pltpu.VMEM)
    lanespec = pl.BlockSpec((1, lblk), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)

    corr, colsum = pl.pallas_call(
        functools.partial(_kernel_ns_wide, m=m, blk=blk),
        grid=(np_ // lblk, mp // blk),
        in_specs=[rowspec, rowspec, vecspec, vecspec, vecspec,
                  lanespec, lanespec],
        out_specs=(lanespec, lanespec),
        out_shape=(
            jax.ShapeDtypeStruct((1, np_), f32),
            jax.ShapeDtypeStruct((1, np_), f32),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(
        _pad_rows_blk(_pad_cols(dX, np_), mp),
        _pad_rows_blk(_pad_cols(dG, np_), mp),
        colb(ql0, 1.0), colb(ql1, 0.0), colb(w, 0.0),
        _pad_cols(qr_b[None, :], np_, 1.0),
        _pad_cols(dG_last[None, :], np_, 0.0),
    )

    corr = corr[0, :n]
    B_last = (dX_last / ql0[-1] - corr) / qr_b
    # one XLA sweep over (dX, dG): the row-space reductions + the bias
    # matvec that corr gates. Row mask excludes the last (arrow) row;
    # XLA fuses the elementwise producers into the reductions.
    rmask = (jnp.arange(m) != m - 1)[:, None]
    a = jnp.where(rmask, ql0[:, None] * dG + ql1[:, None] * dG_last[None, :],
                  0.0) * qr_b[None, :]
    bt = jnp.where(rmask, dX, 0.0) / ql0[:, None] / qr_b[None, :]
    diag = jnp.sum(a * a - bt * bt, axis=1)
    biasa = a @ A_last
    btdot = (dX @ (B_last / qr_b)) / ql0
    diag = diag.at[m - 1].set(jnp.sum(A_last**2 - B_last**2))
    bias = (biasa - btdot).at[m - 1].set(0.0)
    grad2 = colsum[0, :n] + A_last**2 - B_last**2
    return _norm_post(ql0, ql1, diag, bias, jnp.max(jnp.abs(grad2)),
                      step, tiny, True, qr_b, grad2)


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update_nd(ql, Qr, dX, dG, step, tiny: float,
                    interpret: bool = False):
    """(norm, dense) streaming update for arbitrary m; ql: (2, m),
    Qr: (n, n) upper-tri with n <= MAX_DENSE."""
    f32 = jnp.float32
    m, n = dX.shape
    np_ = _cdiv(n, BS) * BS
    blk = _blk_major(np_)
    mp = _cdiv(m, blk) * blk
    nbq = np_ // BS
    step = jnp.asarray(step, f32)

    rho = jnp.sqrt(jnp.max(ql[0]) / jnp.max(jnp.diagonal(Qr)))
    ql = ql / rho
    Qr_b = rho * Qr
    ql0, ql1 = ql[0], ql[1]

    Qrp = Qr_b
    if np_ > n:
        Qrp = jnp.zeros((np_, np_), f32).at[:n, :n].set(Qr_b)
        Qrp = Qrp + jnp.diag(jnp.concatenate(
            [jnp.zeros((n,), f32), jnp.ones((np_ - n,), f32)]
        ))

    dX_last, dG_last = dX[-1], dG[-1]
    A_last = ql0[-1] * (dG_last @ Qr_b.T)                 # (n,)
    w = ql1 / (ql0 * ql0[-1])

    row1 = lambda x, fill: _pad_cols(x[None, :], np_, fill)
    colb = lambda x, fill: _pad_rows_blk(x[:, None], mp, fill)
    rowspec = pl.BlockSpec((blk, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vecspec = pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    diag0, biasa, corr, grama, gramb = pl.pallas_call(
        functools.partial(_kernel_nd_big, m=m, blk=blk, nbq=nbq),
        grid=(mp // blk,),
        in_specs=[rowspec, rowspec, vecspec, vecspec, vecspec,
                  rep((np_, np_)), rep((1, np_)), rep((1, np_))],
        out_specs=(vecspec, vecspec, rep((1, np_)),
                   rep((np_, np_)), rep((np_, np_))),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 1), f32),
            jax.ShapeDtypeStruct((mp, 1), f32),
            jax.ShapeDtypeStruct((1, np_), f32),
            jax.ShapeDtypeStruct((np_, np_), f32),
            jax.ShapeDtypeStruct((np_, np_), f32),
        ),
        scratch_shapes=[pltpu.VMEM((nbq, BS, BS), f32)],
        interpret=interpret,
        compiler_params=_params(),
    )(
        _pad_rows_blk(_pad_cols(dX, np_), mp),
        _pad_rows_blk(_pad_cols(dG, np_), mp),
        colb(ql0, 1.0), colb(ql1, 0.0), colb(w, 0.0),
        Qrp, row1(dG_last, 0.0), row1(A_last, 0.0),
    )

    corr = corr[0, :n]
    z = dX_last / ql0[-1] - corr
    B_last = linalg.solve_ut_t(Qr_b, z)                   # z @ Qr^{-1}
    diag = diag0[:m, 0].at[m - 1].set(jnp.sum(A_last**2 - B_last**2))
    y = linalg.solve_ut(Qr_b, B_last)                     # Qr^{-1} B_last^T
    btdot = (dX @ y) / ql0
    bias = (biasa[:m, 0] - btdot).at[m - 1].set(0.0)
    grad2 = linalg.triu(
        grama[:n, :n] - gramb[:n, :n]
        + jnp.outer(A_last, A_last) - jnp.outer(B_last, B_last)
    )
    return _norm_post(ql0, ql1, diag, bias, jnp.max(jnp.abs(grad2)),
                      step, tiny, False, Qr_b, grad2)


# ------------------------------------------------------------ (dense, scale)

def _kernel_ds_big(dx_ref, dg_ref, ql_ref, qr_ref,
                   grad2_ref, grama_ref, gramb_ref, invs_ref, *, nbq):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        invs_ref[:] = tri_mod._newton_inv_batched(
            jnp.stack([
                ql_ref[i * BS:(i + 1) * BS, i * BS:(i + 1) * BS].T
                for i in range(nbq)
            ])
        )
        grama_ref[:] = jnp.zeros_like(grama_ref)
        gramb_ref[:] = jnp.zeros_like(gramb_ref)

    ql = ql_ref[:]
    qr = qr_ref[:]
    a = _dot(ql, dg_ref[:]) * qr
    # bt = Ql^{-T} dx / qr: forward block substitution over rows
    dx = dx_ref[:]
    rows = []
    for i in range(nbq):
        acc = dx[i * BS:(i + 1) * BS, :]
        for k in range(i):
            acc = acc - _solve_dot(
                ql[k * BS:(k + 1) * BS, i * BS:(i + 1) * BS].T, rows[k]
            )
        rows.append(_solve_dot(invs_ref[i], acc))
    bt = (jnp.concatenate(rows, axis=0) if nbq > 1 else rows[0]) / qr

    grad2_ref[:] = jnp.sum(a * a - bt * bt, axis=0, keepdims=True)
    grama_ref[:] += _dott(a, a)
    gramb_ref[:] += _dott(bt, bt)


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update_ds(Ql, qr, dX, dG, step, tiny: float,
                    interpret: bool = False):
    """(dense, scale) streaming update for arbitrary n; Ql: (m, m)
    upper-tri with m <= MAX_DENSE, qr: (n,). ONE pass over the probes."""
    f32 = jnp.float32
    m, n = dX.shape
    mp = _cdiv(m, BS) * BS
    blk = _blk_major(mp)
    np_ = _cdiv(n, blk) * blk
    nbq = mp // BS
    step = jnp.asarray(step, f32)

    rho = jnp.sqrt(jnp.max(jnp.diagonal(Ql)) / jnp.max(qr))
    Ql_b = Ql / rho
    qr_b = rho * qr

    Qlp = Ql_b
    if mp > m:
        Qlp = jnp.zeros((mp, mp), f32).at[:m, :m].set(Ql_b)
        Qlp = Qlp + jnp.diag(jnp.concatenate(
            [jnp.zeros((m,), f32), jnp.ones((mp - m,), f32)]
        ))

    colspec = pl.BlockSpec((mp, blk), lambda j: (0, j), memory_space=pltpu.VMEM)
    rowblk = pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    grad2p, grama, gramb = pl.pallas_call(
        functools.partial(_kernel_ds_big, nbq=nbq),
        grid=(np_ // blk,),
        in_specs=[colspec, colspec, rep((mp, mp)), rowblk],
        out_specs=(rowblk, rep((mp, mp)), rep((mp, mp))),
        out_shape=(
            jax.ShapeDtypeStruct((1, np_), f32),
            jax.ShapeDtypeStruct((mp, mp), f32),
            jax.ShapeDtypeStruct((mp, mp), f32),
        ),
        scratch_shapes=[pltpu.VMEM((nbq, BS, BS), f32)],
        interpret=interpret,
        compiler_params=_params(),
    )(
        _pad_cols(_pad_rows_blk(dX, mp), np_),
        _pad_cols(_pad_rows_blk(dG, mp), np_),
        Qlp, _pad_cols(qr_b[None, :], np_, 1.0),
    )

    grad1 = linalg.triu(grama[:m, :m] - gramb[:m, :m])
    step1 = step / (jnp.max(jnp.abs(grad1)) + tiny)
    grad2 = grad2p[0, :n]
    step2 = step / (jnp.max(jnp.abs(grad2)) + tiny)
    return Ql_b - step1 * (grad1 @ Ql_b), qr_b - step2 * grad2 * qr_b


# --------------------------------------------- single-pass (norm, *) APPLY

def _kernel_apply_norm(g_ref, ql0_ref, ql1_ref, gl_ref, r_ref, out_ref,
                       acc_ref, *, m, blk, dense_r):
    """P g for the arrow-left pairs in ONE streamed pass over G.

    The apply chain out = Ql^T ((Ql G) R) (R = Qr^T Qr for (norm, dense),
    diag(qr^2) for (norm, scale)) looks two-pass — Ql's rank-1 term needs
    G's last row, and Ql^T's correction sums over every row — but the
    last row is an O(n) PREFETCH (input, not reduction) and the output
    correction lands only on row m-1, which lives in the FINAL panel:
    accumulate ql1^T Z alongside the streamed output rows and the total is
    complete exactly when the row that needs it is in VMEM. 2mn traffic.

    NOT ROUTED (measured r3, /tmp/apply_ab.py): despite the traffic
    minimum it LOSES to the XLA chain at the reference-envelope shapes —
    2401 vs 1984 us at (131072, 512) nd, 16150 vs 15726 us at
    (65536, 8192) ns. Mechanism: a pallas kernel's HBM bandwidth is
    per-BUFFER (~226 GB/s per streamed operand, ~888 GB/s only with >= 4
    CONCURRENT separate-buffer streams; same-buffer multi-spec does NOT
    parallelize), and this kernel has exactly one big streamed operand
    each direction, so its 2mn move slower than XLA's ~4mn over several
    concurrently-streamed temporaries. Kept as a tested oracle-parity
    kernel; revisit if the apply operand ever arrives pre-split."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    preg = ql0_ref[:] * g_ref[:] + ql1_ref[:] * gl_ref[:]
    if dense_r:
        z = _dot(preg, r_ref[:])          # (blk, np) @ (np, np) on the MXU
    else:
        z = preg * r_ref[:]               # diag right factor: qr^2 lanes
    # padded rows carry ql1 = 0, so they add nothing to the correction
    acc_ref[:] += jnp.sum(ql1_ref[:] * z, axis=0, keepdims=True)
    rows = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    out_ref[:] = ql0_ref[:] * z + jnp.where(rows == m - 1, acc_ref[:], 0.0)


def _apply_norm_call(ql, r, G, dense_r, interpret):
    f32 = jnp.float32
    m, n = G.shape
    np_ = _cdiv(n, BS if dense_r else 128) * (BS if dense_r else 128)
    blk = _blk_major(np_)
    mp = _cdiv(m, blk) * blk

    colb = lambda x, fill: _pad_rows_blk(x[:, None], mp, fill)
    rowspec = pl.BlockSpec((blk, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vecspec = pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    if dense_r:
        rp = r
        if np_ > n:
            rp = jnp.zeros((np_, np_), f32).at[:n, :n].set(r)
        rspec = rep((np_, np_))
    else:
        rp = _pad_cols(r[None, :], np_, 0.0)
        rspec = rep((1, np_))

    out = pl.pallas_call(
        functools.partial(_kernel_apply_norm, m=m, blk=blk, dense_r=dense_r),
        grid=(mp // blk,),
        in_specs=[rowspec, vecspec, vecspec, rep((1, np_)), rspec],
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((mp, np_), f32),
        scratch_shapes=[pltpu.VMEM((1, np_), f32)],
        interpret=interpret,
        compiler_params=_params(),
    )(
        _pad_rows_blk(_pad_cols(G, np_), mp),
        colb(ql[0], 1.0), colb(ql[1], 0.0),
        _pad_cols(G[-1][None, :], np_, 0.0), rp,
    )
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_apply_ns(ql, qr, G, interpret: bool = False):
    """(norm, scale) P g in one streamed pass; ql: (2, m), qr: (n,)."""
    return _apply_norm_call(ql, qr * qr, G, False, interpret)


def _kernel_apply_ns_wide(g_ref, ql0_ref, ql1_ref, gl_ref, r_ref, out_ref,
                          acc_ref, *, m, blk, lblk):
    """Wide-lane (norm, scale) apply: 2-D grid (rows OUTER, lanes inner),
    same one-pass trick as _kernel_apply_norm — the Ql^T correction lands
    only on row m-1, which lives in the FINAL row panel, visited after
    every other panel has pushed its ql1^T z contribution into the
    resident (1, np) accumulator. 2mn traffic.

    NOT ROUTED (r5): briefly routed on a 15.4 ms XLA-apply measurement
    that turned out to be a timing-harness artifact (the carry threading
    `dX + 1e-30*out` materialized a full probe copy per iteration,
    +6 GB/iter — bench.py r5 correction). The corrected A/B has the XLA
    apply chain AT the ~660 GB/s mixed law at every measured shape and
    this kernel slower — (512, 1e6) pair: 15.9 ms (XLA) vs 22.3
    (kernel); (131072, 512): 2.0 vs 2.8 ms; ties elsewhere. Kept as a
    tested oracle-parity kernel like the 1-D fused applies above."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    rowv = rows < m

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # mask ALL row-shaped inputs on partial edge tiles: tile-pad garbage
    # (undefined on hardware) times a zero is NaN, and a NaN on an
    # invalid ROW at a valid LANE would poison the resident accumulator
    ql0 = jnp.where(rowv, ql0_ref[:], 1.0)
    ql1 = jnp.where(rowv, ql1_ref[:], 0.0)
    g = jnp.where(rowv, g_ref[:], 0.0)
    preg = ql0 * g + ql1 * gl_ref[:]
    z = preg * r_ref[:]
    lane = pl.dslice(j * lblk, lblk)
    acc_ref[0, lane] += jnp.sum(ql1 * z, axis=0)
    out_ref[:] = ql0 * z + jnp.where(
        rows == m - 1, acc_ref[0, lane][None, :], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_apply_ns_wide(ql, qr, G, interpret: bool = False):
    """Wide-lane (norm, scale) P g (see _kernel_apply_ns_wide). G and
    the (m, n) output are UNPADDED (pad-free contract: lane-padding a
    2 GB probe is 8 GB of copy traffic); ragged edge blocks mask rows
    in-kernel — invalid LANES only ever produce values that the partial
    output tiles never store, and no division touches them."""
    f32 = jnp.float32
    m, n = G.shape
    lblk = min(_cdiv(n, 128) * 128, LANE_BLK)
    np_ = _cdiv(n, lblk) * lblk
    blk = WIDE2_BLK

    rowspec = pl.BlockSpec((blk, lblk), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    vecspec = pl.BlockSpec((blk, 1), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    lanespec = pl.BlockSpec((1, lblk), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel_apply_ns_wide, m=m, blk=blk, lblk=lblk),
        grid=(_cdiv(m, blk), _cdiv(n, lblk)),
        in_specs=[rowspec, vecspec, vecspec, lanespec, lanespec],
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((m, n), f32),
        scratch_shapes=[pltpu.VMEM((1, np_), f32)],
        interpret=interpret,
        compiler_params=_params(),
    )(
        G, ql[0][:, None], ql[1][:, None],
        G[-1][None, :], (qr * qr)[None, :],
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_apply_nd(ql, Qr, G, interpret: bool = False):
    """(norm, dense) P g in one streamed pass; R = Qr^T Qr precomputed in
    XLA (n <= MAX_DENSE, O(n^2) — off the streaming path)."""
    return _apply_norm_call(ql, _tdot(Qr, Qr), G, True, interpret)
