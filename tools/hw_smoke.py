"""Hardware capacity smoke: compile + run every ROUTED Pallas schedule at
its largest routed size on the real chip, oracle-checked against the XLA
path.

Interpret-mode tests cannot catch scoped-VMEM overruns — dense_big's
gridded path OOM'd the 100MB limit at n >= 8192 on hardware while every
CPU test passed (VALIDATION.md r3). This script is the guard for that
class of bug: run it on the TPU after touching any kernel's block
schedule, caps, or VMEM budgets.

    python tools/hw_smoke.py            # all families
    python tools/hw_smoke.py dense lra  # a subset

Each check builds a perturbed state, runs the family's routed
update_apply (the production path) through the public groups API, and
compares against the XLA formulation with kernels forced off. Default
(bf16) GEMM precision differs between the two paths, so tolerances are
bf16-wide; interpret-mode tests pin exact numerics separately.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from psgd_tf_tpu.ops import pallas as pallas_ops


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))


def _probe(key, n):
    return jax.random.normal(key, (n,), jnp.float32)


def _compare(name, got, ref, tol):
    # strict zip: a pytree-structure mismatch between the pallas and
    # kernels-off paths must be a FAIL, not a silently truncated compare
    worst = max(
        _rel(g, r) for g, r in zip(jax.tree_util.tree_leaves(got),
                                   jax.tree_util.tree_leaves(ref),
                                   strict=True)
    )
    status = "OK " if worst < tol else "FAIL"
    print(f"{status} {name}: rel={worst:.2e} (tol {tol:.0e})", flush=True)
    return worst < tol


def check_dense():
    """Largest routed gridded size (dense_big.MAX_N) + the resident cap."""
    from psgd_tf_tpu.groups import dense
    from psgd_tf_tpu.ops.pallas import dense_big, dense_upd

    # sizes cover every routed schedule at its tightest point: the
    # resident cap, BLK_SWITCH_N (largest BLK=256 gridded size — the
    # scoped-VMEM point that OOM'd pre-fix), an off-multiple BLK_BIG
    # size, and the BLK_BIG cap.
    ok = True
    for n in (dense_upd.MAX_N, dense_big.BLK_SWITCH_N, 9000, dense_big.MAX_N):
        key = jax.random.PRNGKey(n)
        st = dense.init(n, 0.9)
        v, h, g = (_probe(jax.random.fold_in(key, i), n) for i in range(3))
        st2, pre = dense.update_apply(st, v, h, g, step=0.01)
        with pallas_ops.disabled():
            rst, rpre = dense.update_apply(st, v, h, g, step=0.01)
        ok &= _compare(f"dense n={n}", (st2.Q, pre), (rst.Q, rpre), 2e-2)
    return ok


def check_lra():
    from psgd_tf_tpu.groups import lra

    n, r = 1 << 20, 10
    key = jax.random.PRNGKey(3)
    st = lra.init(key, n, rank=r)
    v, h, g = (_probe(jax.random.fold_in(key, i), n) for i in range(3))
    st2, pre = lra.update_apply(st, v, h, g, step=0.01,
                                key=jax.random.fold_in(key, 9))
    with pallas_ops.disabled():
        rst, rpre = lra.update_apply(st, v, h, g, step=0.01,
                                     key=jax.random.fold_in(key, 9))
    return _compare(f"lra n={n} r={r}", (st2.UV, st2.d, pre),
                    (rst.UV, rst.d, rpre), 2e-2)


def check_splu():
    """Resident single-launch at its cap AND the streaming path at n=1M."""
    from psgd_tf_tpu.groups import splu
    from psgd_tf_tpu.ops.pallas import splu_one

    ok = True
    for n in (1 << 16, 1 << 20):
        r = 10
        tag = "resident" if splu_one.fits(r, n) else "streaming"
        key = jax.random.PRNGKey(n)
        st = splu.init(n, rank=r)
        v, h, g = (_probe(jax.random.fold_in(key, i), n) for i in range(3))
        st2, pre = splu.update_apply(st, v, h, g, step=0.01)
        with pallas_ops.disabled():
            rst, rpre = splu.update_apply(st, v, h, g, step=0.01)
        ok &= _compare(
            f"splu n={n} ({tag})",
            (st2.Lt, st2.l3, st2.U12, st2.u3, pre),
            (rst.Lt, rst.l3, rst.U12, rst.u3, rpre), 2e-2,
        )
    return ok


def check_kron():
    """Gridded sparse pairs at the reference capacity envelope + dd at cap."""
    from psgd_tf_tpu.groups import kron
    from psgd_tf_tpu.ops.pallas import kron_dd

    shapes = {
        ("norm", "dense"): (131072, 512),
        ("norm", "scale"): (65536, 8192),
        # multi-lane-panel ns (nj > 1, 2-D grid) past the old 131072
        # resident-lane cap, toward the reference's [1e6, 1e6] guidance.
        # m stays small: the m x n probe itself is the HBM limiter (a
        # (1e4, 1e6) probe would be 40 GB), and the XLA oracle holds
        # several m x n temporaries live.
        # the 1-D ns kernel at its exact resident-lane cap (the wide path
        # takes over beyond MAX_LANES)
        ("norm", "scale", "cap1d"): (512, 131072),
        ("norm", "scale", "wide"): (128, 1_000_000),
        # the single-pass wide kernel at its LARGEST routed lane count
        # (WIDE2_MAX_LANES): its resident full-width accumulators scale
        # with lanes, exactly the scoped-VMEM class interpret tests
        # cannot see
        ("norm", "scale", "wide_cap"): (32, 2_000_000),
        # past WIDE2_MAX_LANES: the retained XLA-sweep wide path (the
        # single-pass kernel's resident accumulators exceed scoped VMEM)
        ("norm", "scale", "wide_xla"): (48, 3_000_000),
        ("dense", "scale"): (512, 131072),
        ("dense", "dense"): (kron_dd.MAX_SIDE, kron_dd.MAX_SIDE),
        # the NMT workload at the reference's REAL dimensions (embed 256,
        # units 1024, spa-eng vocab 9414/4935 — models/nmt.ref_config,
        # VERDICT r4 ask #1): the vocab-scale (scale, dense) embedding
        # (mirrors to ds), the decoder RNN's (norm, scale) at
        # (2*1024+256+1, 1024), and the (norm, scale) fc over the target
        # vocab
        ("scale", "dense", "nmt_emb"): (9414, 256),
        ("norm", "scale", "nmt_rnn"): (2305, 1024),
        ("norm", "scale", "nmt_fc"): (1025, 4935),
    }
    ok = True
    for fmt, shape in shapes.items():
        fmt = fmt[:2]  # strip disambiguation tags
        key = jax.random.PRNGKey(shape[0] ^ shape[1])
        st = kron.init(shape, fmt=fmt, init_scale=0.9)
        dX = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
        dG = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.float32)
        st2 = kron.update(st, dX, dG, step=0.01)
        out = kron.apply(st2, dG)
        with pallas_ops.disabled():
            rst = kron.update(st, dX, dG, step=0.01)
            rout = kron.apply(rst, dG)
        got = tuple(jax.tree_util.tree_leaves(st2)) + (out,)
        ref = tuple(jax.tree_util.tree_leaves(rst)) + (rout,)
        ok &= _compare(f"kron {fmt} {shape}", got, ref, 2e-2)
    return ok


def check_small():
    """xmat / shift at bench scale (single-pass folded kernels)."""
    from psgd_tf_tpu.groups import shift, xmat

    ok = True
    for name, fam in (("xmat", xmat), ("shift", shift)):
        n = 1 << 22
        key = jax.random.PRNGKey(17)
        st = fam.init(n)
        v, h, g = (_probe(jax.random.fold_in(key, i), n) for i in range(3))
        if hasattr(fam, "update_apply"):
            st2, pre = fam.update_apply(st, v, h, g, step=0.01)
            with pallas_ops.disabled():
                rst, rpre = fam.update_apply(st, v, h, g, step=0.01)
        else:
            st2 = fam.update(st, v, h, step=0.01)
            pre = fam.apply(st2, g)
            with pallas_ops.disabled():
                rst = fam.update(st, v, h, step=0.01)
                rpre = fam.apply(rst, g)
        got = tuple(jax.tree_util.tree_leaves(st2)) + (pre,)
        ref = tuple(jax.tree_util.tree_leaves(rst)) + (rpre,)
        ok &= _compare(f"{name} n={n}", got, ref, 2e-2)
    return ok


CHECKS = {
    "dense": check_dense,
    "lra": check_lra,
    "splu": check_splu,
    "kron": check_kron,
    "small": check_small,
}


def main():
    which = sys.argv[1:] or list(CHECKS)
    print(f"backend={jax.default_backend()}", flush=True)
    ok = True
    for name in which:
        try:
            ok &= CHECKS[name]()
        except Exception as exc:  # noqa: BLE001 — a compile failure IS the finding
            print(f"FAIL {name}: {type(exc).__name__}: {exc}", flush=True)
            ok = False
    print("SMOKE PASS" if ok else "SMOKE FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
