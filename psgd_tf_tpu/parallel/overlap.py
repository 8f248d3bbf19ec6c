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


def comm_model(family: str, n_params: int, rank: int = 10,
               dtype_bytes: int = 4) -> dict[str, Any]:
    """Analytic bytes exchanged per SHARDED training step, per device pair
    of collectives (payload, not wire framing) — computable today,
    measurable when multi-chip hardware exists.

    Two independent terms:
      * data parallelism: the loss gradient AND the Hvp probe reduce over
        the `data` axis every step -> 2 * n_params * dtype_bytes.
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
    dp_payload = 2 * n_params * dtype_bytes
    return {
        "family": family,
        "n_params": n_params,
        "rank": rank,
        "dp_bytes_per_step": dp_payload,
        "shard_bytes_per_step": shard_payload,
        "shard_to_state_ratio": shard_payload
        / max(1, n_params * dtype_bytes),
    }
