"""Gridded large-n dense update (+ fused apply) — HBM-streaming Pallas stages.

The single-launch kernel (dense_upd.py) holds Q in VMEM and caps at
n <= MAX_N; the reference's own capacity guidance says the dense family is
worth using to ~1e4 parameters (ref README.md:54), where Q is hundreds of
MB and must stream from HBM. This kernel implements the same rank-2 update

  a = Q h,  b = Q^{-T} v
  step0 = step / (max|triu(a a^T - b b^T)| + tiny)
  Q' = Q - step0 * (a * S_a - b * S_b),   S_x[r, :] = sum_{j >= r} x_j Q[j, :]

with Q touched exactly TWICE (1 read + 1 read+write) — the O(n^2)-traffic
minimum for this formulation given that the exact max-abs step normalizer
must be known before Q can be rewritten:

  AB (grid over ROW panels, sequential): ONE pass computes BOTH probe
      images from the same panel — a_i = panel @ h (h VMEM-resident), and
      b Q = v is solved by forward block substitution: Q's triangularity
      lets b_i finalize AT panel i, then push its contribution to all
      later columns through the panel already in VMEM (prefix sums in a
      persistent scratch; TPU grid steps run in order). Row panels are
      CONTIGUOUS in HBM — the previous column-panel schedule read 1KB
      strided segments and measured 226 GB/s against the 658 GB/s
      contiguous bound                                    (read Q once)
  B2 (grid over row blocks):   exact max|triu(a a^T - b b^T)| computed
      from a, b alone — O(n^2) VPU flops but O(n) memory traffic
  C (grid over row panels, REVERSED index map): the reverse cumulative
      sums ride a running (1, n) scratch; the intra-panel part is ONE
      (B, B) upper-triangular-ones MXU matmul per panel
      (triu_ones @ (a_blk * Q_panel))            (read + write Q once)

With `g` (fused_update_apply) stage C additionally accumulates
P' g = Q'^T (Q' g) panel-by-panel — each row panel contributes
panel^T (panel @ g) independently — so the preconditioned gradient of the
UPDATED Q costs ZERO extra HBM traffic. Update+apply therefore moves
3 n^2 floats total where the separate-call schedule moved 6 n^2 (round-2
bench: 39.5% of the stream bound; see bench.py's per-family traffic
model, which charges the 4 n^2 analytic minimum).

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
from psgd_tf_tpu.ops.pallas.tri import VMEM_LIMIT

# Solve-dot mode for stage AB's substitution products, mirroring
# kron_sparse_big.SOLVE_MODE. REFUTED as a lever here (r5 A/B,
# update+apply pair via groups dispatch, 2 alternated rounds, medians):
#
#     n       highest   bf16x3   default
#     4096      597       591      592   us/pair
#     8192     2318      2312     2324
#    16384     8663      8595     8552
#
# — flat within spread at every size, unlike the gridded kron
# substitutions (12-21% there). Mechanism: stage AB's solve products
# are (1, BLK)-shaped skinny matvecs whose MXU time, even at 6-pass
# HIGHEST, hides behind the panel DMA; dense's distance from the 660
# GB/s mixed stream law is NOT solve-precision compute. HIGHEST stays
# routed (the stronger guarantee at zero measured cost). Third refuted
# lever for this kernel (block shape r3/r4, buffer splitting r3).
SOLVE_MODE = "highest"  # "highest" | "bf16x3" | "default"


def _solve_dot(a, b):
    if SOLVE_MODE == "highest":
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=tri_mod.SOLVE_PRECISION)
    if SOLVE_MODE == "default":
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return tri_mod.dot_bf16x3(a, b)


BLK = 256        # panel height/width (rows per grid step), n <= 8192
BLK_BIG = 128    # above that: stage C keeps ~5 (BLK, n) temporaries live
                 # (wa/wb/sa/sb/newq) and 256-row panels blow the 100 MB
                 # scoped-VMEM limit at n = 16384 (measured: 110.69 MB)
MAX_N = 16384    # (BLK_BIG, n) panels at n=16k are 8MB — a few fit in VMEM
BLK_SWITCH_N = 8192  # module-level so tests can exercise the BLK_BIG path
                     # at interpret-tractable sizes


def _blk(np_: int) -> int:
    return BLK if np_ <= BLK_SWITCH_N else BLK_BIG


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


# ---------------- stage AB: a = Q h and solve Q^T b = v in ONE pass over Q

def _probe_kernel(q_ref, vrow_ref, h_ref, inv_ref, b_ref, a_ref,
                  acc_ref, *, nb):
    """Grid step i over ROW panels (contiguous HBM segments — a COLUMN
    panel of a row-major Q reads 1KB strided segments, measured 226 GB/s
    vs the 658 GB/s contiguous bound; this stage was 422 us of the old
    637 us update at n=4096 for that reason alone).

    Row-streaming works because Q is upper triangular, so the row-form
    solve b Q = v finalizes b_i AT panel i:

      b_i  = (v_i - acc[icols]) inv(Q_ii)          (acc = prefix sums)
      acc += b_i @ Q[irows, :]                     (one (1,BLK) vec-mat —
             contributions to every later column ride the panel already
             in VMEM; writes to columns <= i land on entries never read
             again)
      a_i  = Q[irows, :] @ h                       (h as a (1, n) lane row:
             a (n, 1) column block lane-pads x128 in VMEM — 8 MB at n=16k)

    ALL diagonal-block inversions run as ONE batched Newton chain BEFORE
    the launch (XLA tri._newton_inv_batched — a per-step in-kernel
    _newton_inv puts 2*ceil(log2(BLK)) dependent matmuls inside every grid
    step, a latency critical path) and `invs` streams in per grid step:
    keeping all nb blocks VMEM-resident (plus the in-kernel Newton's diags
    input and scratch) blew the 100 MB scoped-VMEM limit at n = 8192."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]
    blk = q.shape[0]
    a_ref[:] = jax.lax.dot_general(
        q, h_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    rhs = vrow_ref[:] - acc_ref[0, pl.dslice(i * blk, blk)][None, :]
    bi = _solve_dot(rhs, inv_ref[0])
    b_ref[:] = bi
    acc_ref[:] += _solve_dot(bi, q)


# ----------------------- stage B2: exact max|triu(a a^T - b b^T)| from a, b

def _maxabs_kernel(acol_ref, bcol_ref, arow_ref, brow_ref, out_ref, *, n):
    i = pl.program_id(0)
    tile = acol_ref[:] * arow_ref[:] - bcol_ref[:] * brow_ref[:]
    rows = i * tile.shape[0] + jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    m = jnp.max(jnp.where((rows <= cols) & (cols < n), jnp.abs(tile), 0.0))

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = jnp.maximum(out_ref[:], m)


# ------------------- stage C: Q' = Q - step0 (a * S_a - b * S_b), reversed
#                     (+ optional P' g accumulation: zero extra Q traffic)

def _update_kernel(q_ref, acol_ref, bcol_ref, s_ref, newq_ref,
                   ta_ref, tb_ref, *, nb):
    """Row panels processed LAST to FIRST (reversed index map); ta/tb carry
    sum_{j in later panels} x_j Q[j, :]. Intra-panel reverse cumsum =
    upper-triangular-ones matmul."""
    _update_body(q_ref, acol_ref, bcol_ref, s_ref, newq_ref, ta_ref, tb_ref)


def _update_body(q_ref, acol_ref, bcol_ref, s_ref, newq_ref, ta_ref, tb_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ta_ref[:] = jnp.zeros_like(ta_ref)
        tb_ref[:] = jnp.zeros_like(tb_ref)

    q = q_ref[:]
    blk = q.shape[0]
    wa = acol_ref[:] * q                  # (BLK, n): a_j Q[j, :]
    wb = bcol_ref[:] * q
    r = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    triu_ones = jnp.where(r <= c, 1.0, 0.0)
    sa = jnp.dot(triu_ones, wa, preferred_element_type=jnp.float32) + ta_ref[:]
    sb = jnp.dot(triu_ones, wb, preferred_element_type=jnp.float32) + tb_ref[:]

    step0 = s_ref[0]
    newq = q - step0 * (acol_ref[:] * sa - bcol_ref[:] * sb)
    newq_ref[:] = newq

    ta_ref[:] += jnp.sum(wa, axis=0, keepdims=True)
    tb_ref[:] += jnp.sum(wb, axis=0, keepdims=True)
    return newq


def _update_apply_kernel(q_ref, acol_ref, bcol_ref, g_ref, s_ref,
                         newq_ref, pre_ref, ta_ref, tb_ref, *, nb):
    """Stage C + P' g: each row panel of the UPDATED Q contributes
    panel^T (panel @ g) to pre — order-independent, so it rides the
    reversed sweep free of extra traffic. g and pre travel as (1, n) lane
    rows ((n, 1) columns lane-pad x128 in VMEM)."""
    i = pl.program_id(0)
    newq = _update_body(q_ref, acol_ref, bcol_ref, s_ref, newq_ref,
                        ta_ref, tb_ref)

    @pl.when(i == 0)
    def _():
        pre_ref[:] = jnp.zeros_like(pre_ref)

    u = jax.lax.dot_general(
        newq, g_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLK, 1) = panel @ g
    pre_ref[:] += jax.lax.dot_general(
        u, newq, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, n) += u^T @ panel


# ------------------------------------------------------------------ wrapper

def _stages(q, v, h, step, tiny, interpret, g=None):
    n = q.shape[0]
    blk = _blk(_cdiv(n, BLK_BIG) * BLK_BIG)
    np_ = _cdiv(n, blk) * blk
    if np_ > MAX_N:
        raise ValueError(f"gridded dense update cap is n <= {MAX_N}")
    nb = np_ // blk
    f32 = jnp.float32

    qp = q
    if np_ > n:
        qp = jnp.zeros((np_, np_), f32).at[:n, :n].set(q)
        qp = qp + jnp.diag(
            jnp.concatenate([jnp.zeros((n,), f32), jnp.ones((np_ - n,), f32)])
        )
    vrow = jnp.zeros((1, np_), f32).at[0, :n].set(v)
    hrow = jnp.zeros((1, np_), f32).at[0, :n].set(h)

    col_blk = pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    full_row = rep((1, np_))

    # diagonal blocks for the row-form solve, gathered + inverted in XLA
    # as ONE batched Newton chain (a batched-matmul chain XLA schedules as
    # well as a kernel would); the probe stage STREAMS one inverse per grid
    # step — keeping all nb resident cost 2 x nb x BLK^2 floats of scoped
    # VMEM and OOM'd the 100 MB limit at n = 8192
    diags = jnp.stack(
        [qp[j * blk:(j + 1) * blk, j * blk:(j + 1) * blk] for j in range(nb)]
    )
    invs = tri_mod._newton_inv_batched(diags)
    inv_blk = pl.BlockSpec(
        (1, blk, blk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    row_blk = pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM)
    row_panel = pl.BlockSpec(
        (blk, np_), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    # stage AB: a = Q h and b = Q^{-T} v in one CONTIGUOUS row-panel pass
    brow, acol = pl.pallas_call(
        functools.partial(_probe_kernel, nb=nb),
        grid=(nb,),
        in_specs=[row_panel, row_blk, full_row, inv_blk],
        out_specs=(row_blk, col_blk),
        out_shape=(
            jax.ShapeDtypeStruct((1, np_), f32),
            jax.ShapeDtypeStruct((np_, 1), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, np_), f32),
        ],
        interpret=interpret,
        compiler_params=_params(),
    )(qp, vrow, hrow, invs)
    bcol = brow.reshape(np_, 1)

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
        (blk, np_), lambda i: (nb - 1 - i, 0), memory_space=pltpu.VMEM
    )
    rev_blk = pl.BlockSpec(
        (blk, 1), lambda i: (nb - 1 - i, 0), memory_space=pltpu.VMEM
    )
    # Q -> Q' IN PLACE (input_output_aliases): without it, XLA cannot
    # alias the kernel's newq output into a training loop's scan carry
    # and inserts a full Q copy EVERY step — measured r5 at n=16384 as
    # +3.27 ms/step (stage C alone: 3267 us with a loop-invariant Q vs
    # 6534 us with Q fed back as the carry; the 2 GB read+write at the
    # 660 GB/s mixed law is exactly the difference). With the alias the
    # body is a true in-place rewrite; each panel is read before its
    # rewrite within the same grid step, so aliasing is safe.
    if g is None:
        newq = pl.pallas_call(
            functools.partial(_update_kernel, nb=nb),
            grid=(nb,),
            in_specs=[rev_panel, rev_blk, rev_blk,
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=rev_panel,
            out_shape=jax.ShapeDtypeStruct((np_, np_), f32),
            scratch_shapes=[pltpu.VMEM((1, np_), f32), pltpu.VMEM((1, np_), f32)],
            input_output_aliases={0: 0},
            interpret=interpret,
            compiler_params=_params(),
        )(qp, acol, bcol, step0)
        return newq[:n, :n], None

    grow = jnp.zeros((1, np_), f32).at[0, :n].set(g)
    newq, pre = pl.pallas_call(
        functools.partial(_update_apply_kernel, nb=nb),
        grid=(nb,),
        in_specs=[rev_panel, rev_blk, rev_blk, full_row,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(rev_panel, full_row),
        out_shape=(
            jax.ShapeDtypeStruct((np_, np_), f32),
            jax.ShapeDtypeStruct((1, np_), f32),
        ),
        scratch_shapes=[pltpu.VMEM((1, np_), f32), pltpu.VMEM((1, np_), f32)],
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=_params(),
    )(qp, acol, bcol, grow, step0)
    return newq[:n, :n], pre[0, :n]


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
    return _stages(q, v, h, step, tiny, interpret)[0]


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
    """Gridded dense update + P' g of the UPDATED Q in the same sweep;
    returns (Q', pre_grad). Total Q traffic: 2 reads + 1 write."""
    return _stages(q, v, h, step, tiny, interpret, g=g)
