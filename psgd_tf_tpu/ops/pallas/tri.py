"""Blocked triangular solve as a single Pallas kernel.

TPUs have no native `trsm` (the reference leans on TF's C++
`tf.linalg.triangular_solve`, ref :39,:174,:233,:298,:436-452). The
TPU-native formulation here:

  1. Exact inverse of each 128x128 diagonal block by Newton iteration
     X_{k+1} = X_k (2I - A X_k), X_0 = diag(A)^{-1}. For triangular A the
     residual E_k = I - A X_k is strictly triangular (nilpotent) and
     squares every iteration, so after ceil(log2(bs)) = 7 steps the
     inverse is EXACT, not approximate — all MXU matmuls, no sequential
     substitution anywhere.
  2. Block forward/backward substitution across the (n/128)^2 off-diagonal
     blocks — again all (128,128) @ (128,nrhs) MXU matmuls.

One kernel launch total; Q and B stay resident in VMEM (cap: n <= 768).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT = 100 * 2**20  # requested scoped-VMEM for single-launch kernels
#   (v5e has 128MB physical VMEM; the 16MB default capped round-1 kernel sizes)
BS = 128
MAX_N = 768  # VMEM cap for the single-launch kernel (measured: 1024 OOMs the 16MB scoped vmem)

# Precision for the solve GEMMs (Newton inverses + block substitution):
# HIGHEST = bf16x6, error-free fp32 emulation on the MXU. Substitution
# amplifies rounding, so solves stay exact while statistical GEMMs run
# default bf16 (docs/design.md). Precision.HIGH (bf16x3) was tried as a
# cheaper option and crashes pallas lowering on this jax version
# (mlir closed_call cache KeyError) — dot_bf16x3 below implements it
# manually, and the streaming substitutions route through it since r5
# (A/B table in kron_sparse_big.py: accuracy indistinguishable from
# HIGHEST, 57-66% of the HIGHEST->DEFAULT speed gap recovered).
SOLVE_PRECISION = jax.lax.Precision.HIGHEST


def dot_bf16x3(a, b):
    """a @ b as the 3-pass hi/lo bf16 split product (the HIGH-equivalent
    Mosaic does not expose): a = a_hi + a_lo exactly captures fp32
    operand bits in two bf16 halves; of the four cross products only
    lo*lo (magnitude < 2^-16 of hi*hi, below fp32 result rounding) is
    dropped. Accuracy measured indistinguishable from HIGHEST on the
    routed substitutions (kron_sparse_big.py's r5 A/B table)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _eye(bs: int, dtype) -> jax.Array:
    r = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    return (r == c).astype(dtype)


# Precision schedule for the Newton chains: the iteration X <- X(2I - AX)
# is SELF-CORRECTING (quadratic convergence of the residual), so rounding
# injected by early iterations is annihilated by later ones — only the
# LAST iteration's operand rounding survives into the result. Running all
# but the final iteration at default MXU precision (1-pass bf16) and the
# final one at HIGHEST (bf16x6, error-free fp32 emulation) therefore gives
# fp32-level inverses at ~1/4 the MXU passes. This matters: at BLK = 256
# the all-HIGHEST batched chain for a 4096-wide solve costs ~51 GFLOP of
# MXU work — measured as ~+300 us on the dense gridded update's solve
# stage, by far its largest non-traffic cost.

def _newton_inv(a: jax.Array, bs: int) -> jax.Array:
    """Exact inverse of a triangular (bs, bs) block; see module docstring."""
    eye = _eye(bs, a.dtype)
    d = jnp.sum(a * eye, axis=1)  # diagonal (gather-free)
    x = eye * (1.0 / d)[:, None]
    iters = max(1, math.ceil(math.log2(bs)))
    for k in range(iters + 1):
        prec = SOLVE_PRECISION if k == iters else None
        ax = jnp.dot(a, x, preferred_element_type=jnp.float32, precision=prec)
        x = jnp.dot(x, 2.0 * eye - ax, preferred_element_type=jnp.float32, precision=prec)
    return x


def _newton_inv_batched(stack: jax.Array) -> jax.Array:
    """Exact inverses of K stacked triangular (bs, bs) blocks in ONE
    latency chain.

    K independent `_newton_inv` calls cost K * 2*ceil(log2(bs)) DEPENDENT
    matmuls — at reference-scale factor sizes the whole fused kron update
    is latency-bound on exactly that chain (Mosaic does not interleave
    independent chains; measured: a 5-layer one-launch LeNet5 update ran
    69.8 us vs 73.9 us for 5 launches). Stacking turns each Newton step
    into one BATCHED dot whose K elements pipeline back-to-back through
    the MXU: chain length 2*ceil(log2(bs)) total, independent of K
    (measured: 42.8 us for the same 5-layer update, 1.7x)."""
    _, bs, _ = stack.shape
    eye = _eye(bs, stack.dtype)
    d = jnp.sum(stack * eye[None], axis=2)  # (K, bs) diagonals, gather-free
    x = eye[None] * (1.0 / d)[:, :, None]
    bdot = lambda a, b, prec: jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )
    iters = max(1, math.ceil(math.log2(bs)))
    for k in range(iters + 1):
        # mixed precision schedule — see _newton_inv above
        prec = SOLVE_PRECISION if k == iters else None
        ax = bdot(stack, x, prec)
        x = bdot(x, 2.0 * eye[None] - ax, prec)
    return x


def _solve_kernel(q_ref, b_ref, out_ref, *, nb: int, lower: bool, trans: bool):
    """Solve M X = B, M = Q^T if trans else Q; Q strictly triangular blocks.

    Effective orientation: (lower XOR trans) -> forward substitution.
    Block M[i][j] = Q[j*BS:.., i*BS:..]^T when trans else Q[i*BS.., j*BS..].
    """
    forward = lower != trans  # effective lower-triangular system

    def mblock(i, j):
        if trans:
            blk = q_ref[j * BS : (j + 1) * BS, i * BS : (i + 1) * BS]
            return blk.T
        return q_ref[i * BS : (i + 1) * BS, j * BS : (j + 1) * BS]

    order = list(range(nb) if forward else range(nb - 1, -1, -1))
    # every diagonal-block inversion in ONE batched Newton chain upfront
    # (the substitution's latency critical path otherwise)
    invs = _newton_inv_batched(jnp.stack([mblock(i, i) for i in order]))
    done: list[int] = []
    for k, i in enumerate(order):
        acc = b_ref[i * BS : (i + 1) * BS, :]
        for j in done:
            acc = acc - jnp.dot(
                mblock(i, j),
                out_ref[j * BS : (j + 1) * BS, :],
                preferred_element_type=jnp.float32, precision=SOLVE_PRECISION,
            )
        out_ref[i * BS : (i + 1) * BS, :] = jnp.dot(
            invs[k], acc,
            preferred_element_type=jnp.float32,
            precision=SOLVE_PRECISION,
        )
        done.append(i)


@functools.partial(
    jax.jit, static_argnames=("lower", "trans", "interpret")
)
def solve_triangular(
    q: jax.Array,
    b: jax.Array,
    *,
    lower: bool = False,
    trans: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Pallas-blocked solve of (Q or Q^T) X = B; Q (n, n) triangular,
    B (n, nrhs). Pads to 128 multiples (identity diagonal extension keeps
    the padded system exact)."""
    n, nrhs = q.shape[0], b.shape[1] if b.ndim == 2 else 1
    b2 = b[:, None] if b.ndim == 1 else b
    np_, nr_ = _cdiv(n, BS) * BS, max(_cdiv(nrhs, BS) * BS, BS)
    if np_ > MAX_N:
        raise ValueError(f"pallas solve cap is n <= {MAX_N}, got {n}")

    qp = jnp.zeros((np_, np_), q.dtype).at[:n, :n].set(q)
    if np_ > n:
        qp = qp + jnp.diag(
            jnp.concatenate([jnp.zeros((n,), q.dtype), jnp.ones((np_ - n,), q.dtype)])
        )
    bp = jnp.zeros((np_, nr_), b2.dtype).at[:n, :nrhs].set(b2)

    out = pl.pallas_call(
        functools.partial(
            _solve_kernel, nb=np_ // BS, lower=lower, trans=trans
        ),
        out_shape=jax.ShapeDtypeStruct((np_, nr_), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, bp)
    out = out[:n, :nrhs]
    return out[:, 0] if b.ndim == 1 else out
