"""Fused (dense, dense) Kronecker update — one Pallas kernel launch.

The XLA path for `_update_dd` (groups/kron.py, reference parity
/root/reference/preconditioned_stochastic_gradient_descent.py:156-179)
issues ~12 separate ops: balancing reductions, two matmuls for A, two
triangular solves for Bt, four Gram matmuls, two max-abs reductions, two
update matmuls. At reference-scale factor sizes (tens..hundreds) every one
of those is dispatch-latency-bound. This kernel keeps Ql, Qr, dX, dG and
all intermediates in VMEM and does the entire update in one launch:

  rho   = sqrt(max diag Ql / max diag Qr)       (masked for padding)
  A     = (Ql/rho) dG (rho Qr)^T
  Bt    = (Ql/rho)^{-T} dX (rho Qr)^{-1}        (left + right block solves,
                                                 Newton diagonal inverses)
  grad1 = triu(A A^T - Bt Bt^T),  grad2 = triu(A^T A - Bt^T Bt)
  Ql'   = Ql - step/(max|grad1|+tiny) grad1 Ql   (and likewise Qr')

Inputs pad to 128 multiples with an identity diagonal extension, which
keeps the solves and updates exact; masks keep the padded diagonal out of
the balancing maxima. Cap: padded sides <= MAX_SIDE (raised-limit VMEM
budget, tri.VMEM_LIMIT), callers fall back to the XLA path above that.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psgd_tf_tpu.ops.pallas import tri as tri_mod
from psgd_tf_tpu.ops.pallas.tri import BS, VMEM_LIMIT, _eye

# VMEM budget: the kernel holds ~9 (side, side) fp32 arrays live (factors,
# probes, A/Bt, grads, products). Round 1 capped at 384 against the 16MB
# default scoped-vmem limit (512 OOMed at 22.3MB); the pallas_calls now
# request VMEM_LIMIT (v5e has 128MB physical VMEM), lifting the cap to the
# reference's own kron capacity guidance of ~1e3 per side (README.md:54).
MAX_SIDE = 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _blk(ref_or_val, i, j):
    return ref_or_val[i * BS : (i + 1) * BS, j * BS : (j + 1) * BS]


def _left_solve_t(q, b, nb_rows, invs_t):
    """Solve Q^T X = B for upper-triangular Q (values, not refs):
    effective lower system, forward over block rows. `invs_t[i]` is the
    PRECOMPUTED inverse of Q[i,i]^T (one batched Newton chain upstream —
    tri._newton_inv_batched — instead of a per-row latency chain here).
    Returns X."""
    rows = []
    for i in range(nb_rows):
        acc = b[i * BS : (i + 1) * BS, :]
        for j in range(i):
            mij = _blk(q, j, i).T  # (Q^T)[i, j] = Q[j, i]^T
            acc = acc - jnp.dot(mij, rows[j], preferred_element_type=jnp.float32, precision=tri_mod.SOLVE_PRECISION)
        rows.append(jnp.dot(invs_t[i], acc, preferred_element_type=jnp.float32, precision=tri_mod.SOLVE_PRECISION))
    return jnp.concatenate(rows, axis=0) if nb_rows > 1 else rows[0]


def _right_solve(q, b, nb_cols, invs):
    """Solve X Q = B for upper-triangular Q: forward over block columns,
    with `invs[j]` the precomputed inverse of Q[j,j]."""
    cols = []
    for j in range(nb_cols):
        acc = b[:, j * BS : (j + 1) * BS]
        for k in range(j):
            acc = acc - jnp.dot(
                cols[k], _blk(q, k, j),
                preferred_element_type=jnp.float32,
                precision=tri_mod.SOLVE_PRECISION,
            )
        cols.append(jnp.dot(acc, invs[j], preferred_element_type=jnp.float32, precision=tri_mod.SOLVE_PRECISION))
    return jnp.concatenate(cols, axis=1) if nb_cols > 1 else cols[0]


def _masked_diag_max(q, true_n, size):
    d = jnp.sum(q * _eye(size, q.dtype), axis=1, keepdims=True)  # (size, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)
    return jnp.max(jnp.where(idx < true_n, d, -jnp.inf))


def _triu_mask(x):
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(r <= c, x, 0.0)


def _balanced(ql, qr, m, n, mp, np_):
    """Dynamic-range balancing (ref :166-170) with the padding masked out
    of the maxima and re-imposed as exact identity after scaling (so the
    solves stay valid). m, n may be traced."""
    rho = jnp.sqrt(_masked_diag_max(ql, m, mp) / _masked_diag_max(qr, n, np_))
    eye_mp = _eye(mp, ql.dtype)
    eye_np = _eye(np_, qr.dtype)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
    ql_b = jnp.where(ridx >= m, eye_mp, ql * (1.0 / rho))
    ridxn = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    qr_b = jnp.where(ridxn >= n, eye_np, qr * rho)
    return ql_b, qr_b


def _diag_blocks_t(q, p):
    """Transposed (BS, BS) diagonal blocks — what the LEFT solve inverts
    ((Q^T)[i,i] = Q[i,i]^T)."""
    return [_blk(q, i, i).T for i in range(p // BS)]


def _diag_blocks_plain(q, p):
    """Plain diagonal blocks — what the RIGHT solve inverts."""
    return [_blk(q, j, j) for j in range(p // BS)]


def _diag_blocks(ql_b, qr_b, mp, np_):
    """The (BS, BS) diagonal blocks both solves need inverted, in the
    unpack order _finish expects."""
    return _diag_blocks_t(ql_b, mp) + _diag_blocks_plain(qr_b, np_)


def _finish(ql_b, qr_b, dx, dg, step, invs, mp, np_, tiny):
    """Everything after balancing + diagonal-block inversion: probes
    through Q, group gradients, normalized triangular updates. `invs` is
    the flat inverse list in `_diag_blocks` order."""
    # Statistical GEMMs (A, Grams, updates) run at default MXU precision —
    # matching the XLA baseline path, whose matmuls are bf16 on TPU. Only
    # the solves (substitution + the upstream batched Newton) pin
    # Precision.HIGHEST, where rounding would amplify through substitution.
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    tdot = lambda a, b: jax.lax.dot_general(  # a^T @ b
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dott = lambda a, b: jax.lax.dot_general(  # a @ b^T
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    nl = mp // BS

    a = dott(dot(ql_b, dg), qr_b)                      # Ql dG Qr^T
    w = _left_solve_t(ql_b, dx, nl, invs[:nl])         # Ql^{-T} dX
    bt = _right_solve(qr_b, w, np_ // BS, invs[nl:])   # ... Qr^{-1}

    grad1 = _triu_mask(dott(a, a) - dott(bt, bt))
    grad2 = _triu_mask(tdot(a, a) - tdot(bt, bt))
    step1 = step / (jnp.max(jnp.abs(grad1)) + tiny)
    step2 = step / (jnp.max(jnp.abs(grad2)) + tiny)

    return ql_b - step1 * dot(grad1, ql_b), qr_b - step2 * dot(grad2, qr_b)


def _update_body(ql, qr, dx, dg, m, n, step, mp, np_, tiny):
    """The full (dense, dense) update on padded values. m, n may be traced
    (the batched kernel reads them per-program from SMEM); mp, np_ are the
    static padded sides. Returns (newql, newqr).

    All diagonal-block Newton inversions run as ONE batched chain
    (tri._newton_inv_batched) — the update's latency critical path — then
    the substitutions consume the precomputed inverses."""
    ql_b, qr_b = _balanced(ql, qr, m, n, mp, np_)
    invs = tri_mod._newton_inv_batched(jnp.stack(_diag_blocks(ql_b, qr_b, mp, np_)))
    k = mp // BS + np_ // BS
    return _finish(
        ql_b, qr_b, dx, dg, step, [invs[i] for i in range(k)], mp, np_, tiny
    )


def _kernel(ql_ref, qr_ref, dx_ref, dg_ref, s_ref, newql_ref, newqr_ref,
            *, m, n, mp, np_, tiny):
    newql_ref[:], newqr_ref[:] = _update_body(
        ql_ref[:], qr_ref[:], dx_ref[:], dg_ref[:],
        m, n, s_ref[0, 0], mp, np_, tiny,
    )


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update(
    ql: jax.Array,
    qr: jax.Array,
    dx: jax.Array,
    dg: jax.Array,
    step: jax.Array | float,
    tiny: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One-launch (dense, dense) Kron update. Returns (Ql', Qr') with the
    balancing applied (matching groups.kron._update_dd semantics)."""
    m, n = dx.shape
    mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS
    if max(mp, np_) > MAX_SIDE:
        raise ValueError(f"fused kron_dd cap is side <= {MAX_SIDE}")

    def pad_q(q, p):
        d = q.shape[0]
        if p == d:
            return q
        out = jnp.zeros((p, p), q.dtype).at[:d, :d].set(q)
        return out + jnp.diag(
            jnp.concatenate([jnp.zeros((d,), q.dtype), jnp.ones((p - d,), q.dtype)])
        )

    def pad_m(x):
        return jnp.zeros((mp, np_), x.dtype).at[:m, :n].set(x)

    s = jnp.asarray(step, ql.dtype).reshape(1, 1)
    new_ql, new_qr = pl.pallas_call(
        functools.partial(
            _kernel, m=m, n=n, mp=mp, np_=np_, tiny=tiny
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, mp), ql.dtype),
            jax.ShapeDtypeStruct((np_, np_), qr.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        # factors rewritten in place: otherwise XLA copies both new
        # factors into a training loop's scan carry every step (the
        # dense_big r5 finding; whole-array VMEM blocks make the alias
        # unconditionally safe — the kernel's working copies are VMEM)
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(pad_q(ql, mp), pad_q(qr, np_), pad_m(dx), pad_m(dg), s)
    return new_ql[:m, :m], new_qr[:n, :n]


def _batched_kernel(mn_ref, s_ref, ql_ref, qr_ref, dx_ref, dg_ref,
                    newql_ref, newqr_ref, *, S, T, tiny):
    i = pl.program_id(0)
    newql, newqr = _update_body(
        ql_ref[0], qr_ref[0], dx_ref[0], dg_ref[0],
        mn_ref[i, 0], mn_ref[i, 1], s_ref[0], S, T, tiny,
    )
    newql_ref[0] = newql
    newqr_ref[0] = newqr


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update_batched(
    ql: jax.Array,       # (B, S, S) identity-extended beyond each layer's m
    qr: jax.Array,       # (B, T, T)
    dx: jax.Array,       # (B, S, T) zero-padded
    dg: jax.Array,       # (B, S, T)
    ms: jax.Array,       # (B,) int32 true left sizes
    ns: jax.Array,       # (B,) int32 true right sizes
    step: jax.Array | float,
    tiny: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """All B (dense, dense) layer updates in ONE gridded launch.

    Grid = (B,); program i pulls layer i's padded blocks into VMEM and runs
    the same fused body as `fused_update`, with the true (m, n) read from a
    scalar-prefetched SMEM table. Block fetches pipeline across programs,
    so the per-launch cost is paid once for the whole layer zoo instead of
    once per layer (groups/kron.py batched path).
    """
    B, S, _ = ql.shape
    T = qr.shape[1]
    if max(S, T) > MAX_SIDE:
        raise ValueError(f"fused kron_dd cap is side <= {MAX_SIDE}")
    if S % BS or T % BS:
        raise ValueError(f"padded sides must be multiples of {BS}")
    mn = jnp.stack([ms.astype(jnp.int32), ns.astype(jnp.int32)], axis=1)
    s = jnp.asarray(step, ql.dtype).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # mn table + step scalar
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, S), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, T, T), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, S, T), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, S, T), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, S, S), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, T, T), lambda i, *_: (i, 0, 0)),
        ),
    )
    new_ql, new_qr = pl.pallas_call(
        functools.partial(_batched_kernel, S=S, T=T, tiny=tiny),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, S, S), ql.dtype),
            jax.ShapeDtypeStruct((B, T, T), qr.dtype),
        ),
        # stacked factors in place (see fused_update above); alias
        # indices count the scalar-prefetch operands, so ql/qr are
        # inputs 2 and 3
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(mn, s, ql, qr, dx, dg)
    return new_ql, new_qr


# ---------------------------------------------------------------------------
# multi-layer heterogeneous path — a whole layer zoo, one launch, ONE
# Newton chain
# ---------------------------------------------------------------------------
# A model like LeNet5 carries several (dense, dense) layers of DIFFERENT
# padded sizes (bucketed batching needs same-size stacks and loses below
# ~4 same-size members — see groups/kron.py). Per-layer launches serialize
# their latency chains: each body is ~30 dependent MXU ops dominated by
# per-block Newton inversions, and Mosaic does not interleave independent
# chains across launches (measured on LeNet5's 5 layers: 73.9 us for 5
# launches, 69.8 us merely concatenated into one). This path instead emits
# every layer in ONE kernel and hoists ALL layers' diagonal-block
# inversions into a single batched Newton chain (tri._newton_inv_batched):
# measured 42.8 us for the same 5 layers, 1.7x.

def _multi_kernel(*refs, shapes, tiny):
    L = len(shapes)
    step = refs[4 * L][0, 0]
    outs = refs[4 * L + 1 :]
    bal = []
    blocks = []
    for i, (m, n) in enumerate(shapes):
        mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS
        ql_b, qr_b = _balanced(refs[4 * i][:], refs[4 * i + 1][:], m, n, mp, np_)
        bal.append((ql_b, qr_b, mp, np_))
        blocks.extend(_diag_blocks(ql_b, qr_b, mp, np_))
    invs = tri_mod._newton_inv_batched(jnp.stack(blocks))
    k = 0
    for i, (m, n) in enumerate(shapes):
        ql_b, qr_b, mp, np_ = bal[i]
        nk = mp // BS + np_ // BS
        outs[2 * i][:], outs[2 * i + 1][:] = _finish(
            ql_b, qr_b, refs[4 * i + 2][:], refs[4 * i + 3][:],
            step, [invs[k + j] for j in range(nk)], mp, np_, tiny,
        )
        k += nk


# VMEM chunking for the multi launch: a layer's live set is ~9 (side, side)
# arrays (same budget note as MAX_SIDE above); chunk the layer list so the
# summed footprint stays under the scoped-VMEM request.
_MULTI_VMEM_BUDGET = int(0.6 * VMEM_LIMIT)


def _layer_bytes(m: int, n: int) -> int:
    mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS
    return 4 * (4 * mp * mp + 4 * np_ * np_ + 4 * mp * np_)


def chunk_layers(shapes) -> list[list[int]]:
    """Greedy split of layer indices into one-launch chunks that fit the
    VMEM budget (order-preserving)."""
    chunks: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for i, (m, n) in enumerate(shapes):
        b = _layer_bytes(m, n)
        if cur and cur_bytes + b > _MULTI_VMEM_BUDGET:
            chunks.append(cur)
            cur, cur_bytes = [], 0
        cur.append(i)
        cur_bytes += b
    if cur:
        chunks.append(cur)
    return chunks


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def _fused_update_multi_chunk(qls, qrs, dxs, dgs, step, tiny, interpret=False):
    shapes = tuple(x.shape for x in dxs)
    flat = []
    out_shapes = []
    for ql, qr, dx, dg, (m, n) in zip(qls, qrs, dxs, dgs, shapes):
        mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS

        def pad_q(q, p):
            d = q.shape[0]
            if p == d:
                return q
            # identity extension via elementwise iota masks — an
            # index-array scatter here costs ~10 us/factor on TPU
            out = jnp.zeros((p, p), q.dtype).at[:d, :d].set(q)
            r = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
            return jnp.where((r == c) & (r >= d), 1.0, out)

        def pad_m(x):
            if x.shape == (mp, np_):
                return x
            return jnp.zeros((mp, np_), x.dtype).at[:m, :n].set(x)

        flat += [pad_q(ql, mp), pad_q(qr, np_), pad_m(dx), pad_m(dg)]
        out_shapes += [
            jax.ShapeDtypeStruct((mp, mp), jnp.float32),
            jax.ShapeDtypeStruct((np_, np_), jnp.float32),
        ]
    s = jnp.asarray(step, jnp.float32).reshape(1, 1)
    outs = pl.pallas_call(
        functools.partial(_multi_kernel, shapes=shapes, tiny=tiny),
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(*flat, s)
    new_qls = [outs[2 * i][:m, :m] for i, (m, _) in enumerate(shapes)]
    new_qrs = [outs[2 * i + 1][:n, :n] for i, (_, n) in enumerate(shapes)]
    return new_qls, new_qrs


def fused_update_multi(qls, qrs, dxs, dgs, step, tiny, interpret=False):
    """One-launch (dense, dense) updates for a HETEROGENEOUS layer list.

    Same per-layer semantics as `fused_update`; lists of unpadded factors
    and probes in, lists of updated factors out. Splits into multiple
    launches only when the summed VMEM footprint demands it."""
    shapes = [x.shape for x in dxs]
    new_qls: list = [None] * len(shapes)
    new_qrs: list = [None] * len(shapes)
    for chunk in chunk_layers(shapes):
        nql, nqr = _fused_update_multi_chunk(
            tuple(qls[i] for i in chunk),
            tuple(qrs[i] for i in chunk),
            tuple(dxs[i] for i in chunk),
            tuple(dgs[i] for i in chunk),
            step, tiny, interpret=interpret,
        )
        for j, i in enumerate(chunk):
            new_qls[i], new_qrs[i] = nql[j], nqr[j]
    return new_qls, new_qrs
