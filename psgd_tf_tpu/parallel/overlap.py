"""Explicit collective/compute overlap: ring reductions on `ppermute`.

GSPMD lowers `lax.psum` to one all-reduce whose schedule is the
compiler's business; nothing in the HLO *structure* lets the rank-space
Gram exchange of a sharded preconditioner update proceed while the next
streaming stage computes. This module provides the north-star mechanism
(BASELINE.md "Hv exchange overlapped with kernel compute"; SURVEY.md §5
"explicit ppermute pipelining where profitable"): reductions built from
`lax.ppermute` hops, each hop an *async* collective-permute the TPU
scheduler can run behind any independent compute — in particular, behind
the Pallas launch that produces the NEXT chunk's partial Gram
(ops/pallas/lra_upd.fused_update_sharded(pipelined=True)).

Single-chip hardware cannot measure the overlap (no second device to
exchange with); the virtual CPU mesh proves correctness
(tests/test_parallel.py), and the communication volumes involved are
recorded by `comm_model` below (reported via bench_scaling.py).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax


def ring_reduce(
    x: jax.Array,
    axis_name: str,
    n_devices: int,
    op: Callable[[jax.Array, jax.Array], jax.Array] = jnp.add,
) -> jax.Array:
    """All-reduce `x` over `axis_name` as a ring of n-1 `ppermute` hops.

    Each hop forwards the running partial one step around the ring and
    folds in the received value; after n-1 hops every device holds the
    full reduction. Latency is (n-1) hops vs one tree all-reduce — the
    point is not to beat `psum` in isolation but that each hop is an
    async collective-permute with NO dependency on compute issued after
    it, so the scheduler can hide the whole chain behind an independent
    kernel launch. Payloads here are rank-space Grams (KBs), so the
    chain is latency- not bandwidth-bound either way.
    """
    if n_devices == 1:
        return x
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]
    acc = x
    buf = x
    for _ in range(n_devices - 1):
        buf = lax.ppermute(buf, axis_name, perm)
        acc = op(acc, buf)
    return acc


def ring_max(x: jax.Array, axis_name: str, n_devices: int) -> jax.Array:
    return ring_reduce(x, axis_name, n_devices, op=jnp.maximum)


def comm_model(family: str, n_params: int | None = None, rank: int = 10,
               dtype_bytes: int = 4,
               param_shapes: list[tuple[int, ...]] | None = None,
               param_specs: list | None = None,
               mesh_shape: dict[str, int] | None = None) -> dict[str, Any]:
    """Analytic bytes exchanged per SHARDED training step, per device pair
    of collectives (payload, not wire framing) — computable today,
    measurable when multi-chip hardware exists.

    Replicated-params (pure DP) call: `comm_model(family, n_params)`.
    Tensor-parallel call: pass `param_shapes` (per-param shapes),
    `param_specs` (aligned `jax.sharding.PartitionSpec`s or None; the
    contract of `parallel.step.build_sharded_step(param_specs=...)`) and
    `mesh_shape` (e.g. `{"data": 4, "shard": 2}`); the DP term is then
    computed PER PARAM from its local shard size rather than the
    full-replication `2 * n_params`.

    Terms:
      * data parallelism: the loss gradient AND the Hvp probe all-reduce
        over the `data` axis every step. A param sharded d ways over
        `shard` contributes its LOCAL size (GSPMD reduces each shard
        independently over `data`) -> 2 * sum(local sizes) * dtype_bytes.
      * tensor parallelism: a `shard`-sharded param's probe (dX), Hvp (dG)
        and gradient each all-gather at the preconditioner boundary — the
        kron factor algebra and the flatten-concat families consume
        replicated per-tensor views (parallel/step.py docstring: "GSPMD
        gathering each TP layer's probe at the shard_map boundary").
        Per-device received payload per gather of a size-s param sharded
        d ways: s * (d-1)/d elements -> 3 gathers per sharded param.
        (The preconditioned-grad slice back to the shard is local.)
      * preconditioner state sharding over `shard`: only RANK-SPACE
        quantities cross devices (the design invariant of every family's
        sharded kernel); O(n) state never moves.
          lra  : stage-1 Gram (2r+2)^2 + apply Gram (2r+2)^2 + maxes
          splu : corner solves replicate r-vectors / r^2 corners
          dense/kron/diag/xmat/shift: zero (replicated factors or
              lane-local folded updates)
    """
    z = 2 * rank + 2
    shard_payload = {
        "lra": (2 * z * z + 8 + 1) * dtype_bytes,
        "splu": (2 * rank * rank + 6 * rank + 8) * dtype_bytes,
        "dense": 0,
        "diag": 0,
        "xmat": 0,
        "shift": 0,
        "kron": 0,
    }[family]

    def _axis_degree(axis_entry):
        d = 1
        for ax in (axis_entry if isinstance(axis_entry, tuple)
                   else (axis_entry,)):
            if ax is not None:
                d *= mesh_shape.get(ax, 1)
        return d

    def _local_size(shape, spec):
        """Per-device shard elements. GSPMD pads each non-divisible
        SHARDED AXIS up to its mesh degree, so the local size is the
        product of per-axis ceil(dim/degree) — not ceil of the flat
        size."""
        if spec is None or mesh_shape is None:
            return int(_prod(shape))
        ent = tuple(spec)
        out = 1
        for k, dim in enumerate(shape):
            d = _axis_degree(ent[k]) if k < len(ent) else 1
            out *= -(-int(dim) // d)
        return out

    def _shard_degree(spec):
        if spec is None or mesh_shape is None:
            return 1
        d = 1
        for axis_entry in tuple(spec):
            d *= _axis_degree(axis_entry)
        return d

    if param_shapes is not None:
        if param_specs is None:
            param_specs = [None] * len(param_shapes)
        if len(param_specs) != len(param_shapes):
            raise ValueError("param_specs must align with param_shapes")
        if mesh_shape is None and any(sp is not None for sp in param_specs):
            # a forgotten mesh_shape would silently treat every spec as
            # degree 1 (tp_gather_bytes_per_step=0, full-size DP terms) —
            # a plausible-looking but wrong TP accounting (ADVICE r4)
            raise ValueError(
                "param_specs given without mesh_shape: pass mesh_shape "
                "(e.g. {'data': 4, 'shard': 2}) so shard degrees resolve"
            )
        sizes = [int(_prod(s)) for s in param_shapes]
        degrees = [_shard_degree(sp) for sp in param_specs]
        locals_ = [_local_size(s, sp)
                   for s, sp in zip(param_shapes, param_specs)]
        n_params = sum(sizes)
        # both the DP reduce and the (d-1) gathered remote shards move
        # the PADDED per-device size
        dp_payload = 2 * sum(locals_) * dtype_bytes
        tp_payload = 3 * sum(
            (d - 1) * loc for loc, d in zip(locals_, degrees)
        ) * dtype_bytes
        n_tp = sum(1 for d in degrees if d > 1)
    else:
        if n_params is None:
            raise ValueError("pass n_params or param_shapes")
        dp_payload = 2 * n_params * dtype_bytes
        tp_payload = 0
        n_tp = 0
    return {
        "family": family,
        "n_params": n_params,
        "rank": rank,
        "dp_bytes_per_step": dp_payload,
        "tp_gather_bytes_per_step": tp_payload,
        "tp_sharded_params": n_tp,
        "shard_bytes_per_step": shard_payload,
        "shard_to_state_ratio": shard_payload
        / max(1, n_params * dtype_bytes),
    }


def _prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out
