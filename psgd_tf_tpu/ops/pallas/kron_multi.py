"""Heterogeneous multi-layer Kronecker update — ALL formats, one launch.

kron_dd.fused_update_multi proved the latency structure for (dense, dense)
layer zoos: per-layer launches serialize ~30-dependent-MXU-op chains and
Mosaic does not interleave independent chains, so merging the zoo into one
kernel and hoisting every diagonal-block Newton inversion into ONE batched
chain bought 1.7x (73.9 -> 42.8 us on LeNet5). The reference's NMT
flagship, however, is a MIXED zoo — (scale, dense), (norm, scale),
(dense, dense) per layer (ref nmt:99-148) — and round 2 still updated its
7 sparse-format members in 7 separate launches (41.1 us/step).

This module generalizes the one-launch design to the full format product:
each layer contributes its `_prep_*` (balance + the diagonal blocks its
solves need inverted — kron_sparse.py / kron_dd.py), ALL layers' blocks
run through a single tri._newton_inv_batched chain, then each `_finish_*`
writes its outputs. Mirrors arrive pre-transposed from the dispatch site
(groups/kron.py update_multi).

Reference parity: per-layer semantics identical to update_precond_kron
(/root/reference/preconditioned_stochastic_gradient_descent.py:67-110)
on every member.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psgd_tf_tpu.ops.pallas import kron_dd, kron_sparse, tri as tri_mod
from psgd_tf_tpu.ops.pallas.tri import BS, VMEM_LIMIT


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# per-kind (n_inputs, n_outputs); inputs exclude the trailing SMEM step
_ARITY = {"dd": (4, 2), "ds": (4, 2), "nd": (5, 3), "ns": (5, 3)}


def _multi_kernel(*refs, specs, tiny):
    """specs: tuple of (kind, m, n, mp, np_). refs = flattened per-layer
    inputs, then the SMEM step, then flattened per-layer outputs."""
    n_in = sum(_ARITY[k][0] for k, *_ in specs)
    step = refs[n_in][0, 0]
    outs = refs[n_in + 1:]

    prepped = []
    blocks = []
    i = 0
    for kind, m, n, mp, np_ in specs:
        args = [r[:] for r in refs[i:i + _ARITY[kind][0]]]
        i += _ARITY[kind][0]
        if kind == "dd":
            ql_b, qr_b = kron_dd._balanced(args[0], args[1], m, n, mp, np_)
            fac, blk = (ql_b, qr_b), kron_dd._diag_blocks(ql_b, qr_b, mp, np_)
        elif kind == "ds":
            fac, blk = kron_sparse._prep_ds(args[0], args[1], m, n, mp, np_)
        elif kind == "nd":
            fac, blk = kron_sparse._prep_nd(
                args[0], args[1], args[2], m, n, mp, np_
            )
        else:  # ns
            fac, blk = kron_sparse._prep_ns(
                args[0], args[1], args[2], m, n, mp, np_
            )
        prepped.append((fac, args[-2], args[-1], len(blocks), len(blk)))
        blocks.extend(blk)

    invs = (
        tri_mod._newton_inv_batched(jnp.stack(blocks)) if blocks else None
    )

    o = 0
    for spec, (fac, dx, dg, b0, nb) in zip(specs, prepped):
        kind, m, n, mp, np_ = spec
        layer_invs = [invs[b0 + j] for j in range(nb)]
        if kind == "dd":
            res = kron_dd._finish(
                fac[0], fac[1], dx, dg, step, layer_invs, mp, np_, tiny
            )
        elif kind == "ds":
            res = kron_sparse._finish_ds(
                *fac, dx, dg, layer_invs, step,
                m=m, n=n, mp=mp, np_=np_, tiny=tiny,
            )
        elif kind == "nd":
            res = kron_sparse._finish_nd(
                *fac, dx, dg, layer_invs, step,
                m=m, n=n, mp=mp, np_=np_, tiny=tiny,
            )
        else:
            res = kron_sparse._finish_ns(
                *fac, dx, dg, layer_invs, step,
                m=m, n=n, mp=mp, np_=np_, tiny=tiny,
            )
        for r in res:
            outs[o][:] = r
            o += 1


def _layer_bytes(kind: str, m: int, n: int) -> int:
    mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS
    probes = 4 * mp * np_          # dx, dg, A, Bt live together
    if kind == "dd":
        return 4 * (probes + 4 * mp * mp + 4 * np_ * np_)
    if kind == "ds":
        return 4 * (probes + 4 * mp * mp)
    if kind == "nd":
        return 4 * (probes + 4 * np_ * np_)
    return 4 * (probes + 2 * mp * np_)   # ns: outer-difference temps


_MULTI_VMEM_BUDGET = int(0.6 * VMEM_LIMIT)


def chunk_layers(kinds, shapes) -> list[list[int]]:
    """Greedy order-preserving split into launches that fit VMEM."""
    chunks: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for i, (k, (m, n)) in enumerate(zip(kinds, shapes)):
        b = _layer_bytes(k, m, n)
        if cur and cur_bytes + b > _MULTI_VMEM_BUDGET:
            chunks.append(cur)
            cur, cur_bytes = [], 0
        cur.append(i)
        cur_bytes += b
    if cur:
        chunks.append(cur)
    return chunks


def _pad_inputs(kind, a, b, dx, dg, mp, np_):
    """Pad one layer's factors + probes to its (mp, np_) slot; returns the
    flat input list in kernel order."""
    f32 = jnp.float32
    m, n = dx.shape
    pad_probe = lambda x: (
        x if x.shape == (mp, np_)
        else jnp.zeros((mp, np_), f32).at[:m, :n].set(x)
    )
    if kind == "dd":
        return [
            kron_sparse._pad_dense(a, mp), kron_sparse._pad_dense(b, np_),
            pad_probe(dx), pad_probe(dg),
        ]
    if kind == "ds":
        return [
            kron_sparse._pad_dense(a, mp), kron_sparse._pad_scale(b, np_),
            pad_probe(dx), pad_probe(dg),
        ]
    ql0, ql1 = kron_sparse._pad_arrow(a, mp)
    right = (
        kron_sparse._pad_dense(b, np_) if kind == "nd"
        else kron_sparse._pad_scale(b, np_)
    )
    return [ql0, ql1, right, pad_probe(dx), pad_probe(dg)]


def _out_shapes(kind, mp, np_):
    f32 = jnp.float32
    if kind == "dd":
        return [jax.ShapeDtypeStruct((mp, mp), f32),
                jax.ShapeDtypeStruct((np_, np_), f32)]
    if kind == "ds":
        return [jax.ShapeDtypeStruct((mp, mp), f32),
                jax.ShapeDtypeStruct((1, np_), f32)]
    right = (
        jax.ShapeDtypeStruct((np_, np_), f32) if kind == "nd"
        else jax.ShapeDtypeStruct((1, np_), f32)
    )
    return [jax.ShapeDtypeStruct((mp, 1), f32),
            jax.ShapeDtypeStruct((mp, 1), f32), right]


def _unpad(kind, outs, m, n):
    """Slice one layer's padded outputs back to (ql, qr) convention."""
    if kind == "dd":
        return outs[0][:m, :m], outs[1][:n, :n]
    if kind == "ds":
        return outs[0][:m, :m], outs[1][0, :n]
    ql = jnp.stack([outs[0][:m, 0], outs[1][:m, 0]])
    return ql, (outs[2][:n, :n] if kind == "nd" else outs[2][0, :n])


@functools.partial(jax.jit, static_argnames=("kinds", "tiny", "interpret"))
def _chunk_call(kinds, qls, qrs, dxs, dgs, step, tiny, interpret=False):
    specs = []
    flat = []
    out_shapes = []
    for kind, a, b, dx, dg in zip(kinds, qls, qrs, dxs, dgs):
        m, n = dx.shape
        mp, np_ = _cdiv(m, BS) * BS, _cdiv(n, BS) * BS
        specs.append((kind, m, n, mp, np_))
        flat += _pad_inputs(kind, a, b, dx, dg, mp, np_)
        out_shapes += _out_shapes(kind, mp, np_)
    s = jnp.asarray(step, jnp.float32).reshape(1, 1)
    outs = pl.pallas_call(
        functools.partial(_multi_kernel, specs=tuple(specs), tiny=tiny),
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(*flat, s)
    res = []
    o = 0
    for kind, m, n, _, _ in specs:
        n_out = _ARITY[kind][1]
        res.append(_unpad(kind, outs[o:o + n_out], m, n))
        o += n_out
    return res


def fused_update_multi(kinds, qls, qrs, dxs, dgs, step, tiny,
                       interpret=False):
    """One-launch updates for a HETEROGENEOUS mixed-format layer list.

    kinds[i] in {"dd", "ds", "nd", "ns"} (mirrors pre-transposed by the
    caller); per-layer semantics identical to the single-layer kernels.
    Returns a list of (new_ql, new_qr). Splits into multiple launches only
    when the summed VMEM footprint demands it."""
    shapes = [x.shape for x in dxs]
    out: list = [None] * len(shapes)
    for chunk in chunk_layers(kinds, shapes):
        res = _chunk_call(
            tuple(kinds[i] for i in chunk),
            tuple(qls[i] for i in chunk),
            tuple(qrs[i] for i in chunk),
            tuple(dxs[i] for i in chunk),
            tuple(dgs[i] for i in chunk),
            step, tiny, interpret=interpret,
        )
        for j, i in enumerate(chunk):
            out[i] = res[j]
    return out
