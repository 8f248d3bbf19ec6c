"""Sharding policies: where each piece of PSGD state lives on the mesh.

Per SURVEY.md §2.4, the one real distributed-design problem this library
owns is block-partitioning the preconditioner state itself:

  dense  : Q replicates at every size, so the fused kernels (dense_upd
           single-launch, dense_big gridded) run per-device. The update's
           triangular solve and reverse-cumsum rank-2 form are sequential
           along rows — row-sharding buys no parallelism and GSPMD's
           cumsum partition is pathological (see precond_sharding) — and
           the family's capacity envelope (n ~ 1e4, ref README.md:54)
           keeps replicated Q cheap next to model state.
  diag   : q over `shard`.
  xmat   : folded (2, m) rows over `shard` along the pair axis. The folded
           layout (groups/xmat.py) co-locates each coupled (i, n-1-i) pair,
           so the update itself needs NO cross-device exchange; only the
           probe fold/unfold at the boundary reverses data once.
  shift  : same folded pair-axis sharding as xmat (orbits {i, i+m}
           co-located; the fold is a pure reshape, groups/shift.py).
  splu   : rank-major Lt/U12 columns (the parameter axis) and the diagonal
           tails over `shard`; the r x r corner solves replicate
           (all_gather of r-vectors).
  lra    : U, V are rank-major (r, n) — the parameter axis (axis 1) shards
           over `shard` together with d and the probes; the r x r Grams
           (V U^T etc.) become psum-reduced wide contractions.
  kron   : per-layer factors replicate (they are small by design — the
           README's own capacity table caps dense factors at ~1e3); the
           *batch* axis carries the parallelism for those workloads.

Parameters and gradients replicate (pure DP); batches shard over `data`.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from psgd_tf_tpu.groups import dense, diag, lra, shift, splu, xmat
from psgd_tf_tpu.optim.psgd import KronPrecond, PSGDState


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def precond_sharding(mesh: Mesh, precond: Any) -> Any:
    """A pytree of NamedShardings matching a family state's structure."""
    row = NamedSharding(mesh, P("shard"))
    rowmat = NamedSharding(mesh, P("shard", None))
    colmat = NamedSharding(mesh, P(None, "shard"))
    rep = replicated(mesh)

    if isinstance(precond, dense.DenseState):
        # Q replicates at every size. The dense capacity envelope tops out
        # at n ~ 1e4 (ref README.md:54; dense_big.MAX_N = 16384, ~1GB fp32
        # replicated — cheap next to model state at that scale), and both
        # the update's triangular solve and its reverse-cumsum rank-2 form
        # are SEQUENTIAL along the row axis: row-sharding buys no speed,
        # and GSPMD's partition of cumsum over a sharded axis was measured
        # pathological (a (3456,)^2 reverse cumsum failed to complete in
        # 120s on the virtual mesh vs 0.8s replicated). Replication keeps
        # the fused kernels runnable per device (replicated_call).
        return dense.DenseState(Q=rep)
    if isinstance(precond, diag.DiagState):
        return diag.DiagState(q=row)
    if isinstance(precond, xmat.XMatState):
        return xmat.XMatState(
            af=colmat, bf=colmat, ac=rep, odd=precond.odd
        )
    if isinstance(precond, shift.ShiftState):
        # same folded co-location argument as xmat: each {i, i+m} orbit is
        # a column of the (2, m) state, so pair-axis sharding needs no
        # cross-device exchange
        return shift.ShiftState(
            af=colmat, bf=colmat, ac=rep, odd=precond.odd
        )
    if isinstance(precond, splu.SpLUState):
        return splu.SpLUState(Lt=colmat, l3=row, U12=colmat, u3=row)
    if isinstance(precond, splu.SpLUStreamState):
        # kernel-layout streaming state (r5): corners replicate, padded
        # tails shard over lanes exactly like the legacy columns (ntp is
        # a BLKN multiple, divisible by any power-of-two shard degree)
        return splu.SpLUStreamState(
            L1t=rep, U1=rep, L2tp=colmat, U2p=colmat, l3p=row, u3p=row,
            n=precond.n,
        )
    if isinstance(precond, lra.LRAState):
        return lra.LRAState(UV=colmat, d=row)
    if isinstance(precond, (list, tuple)):  # kron: replicate every factor
        return type(precond)(
            jax.tree_util.tree_map(lambda _: rep, ks) for ks in precond
        )
    if isinstance(precond, KronPrecond):
        # kron with the batched dd group: small factors, replicate all —
        # the stacked (B, S, S) factors are still tiny vs model state
        return jax.tree_util.tree_map(lambda _: rep, precond)
    raise TypeError(f"no sharding policy for {type(precond)!r}")


def state_sharding(mesh: Mesh, state: PSGDState) -> PSGDState:
    """Shardings for the full PSGDState pytree."""
    rep = replicated(mesh)
    return PSGDState(
        count=rep,
        hyper=jax.tree_util.tree_map(lambda _: rep, state.hyper),
        precond=precond_sharding(mesh, state.precond),
        always_update=state.always_update,  # static field: match treedef
    )
