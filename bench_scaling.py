"""Scaling-efficiency harness: sharded preconditioner throughput vs mesh size.

BASELINE.md targets >= 80% nnz/s scaling efficiency from 1 chip to >= 2
hosts. This harness measures the lane-sharded LRA update+apply (the
pod-scale family, SURVEY.md §2.4) across mesh sizes and reports efficiency
relative to the single-device run.

Paths: `kernel` routes through the shard_map'd fused Pallas update
(ops/pallas/lra_upd.fused_update_sharded, psum'd rank-space reductions);
`xla` forces the GSPMD-partitioned XLA fallback. On real TPU meshes run
with --path kernel (the production configuration). What runs where on this
machine:

  * one real TPU chip: measures the shard_map'd kernel on a 1-device mesh
    against the raw unsharded kernel — the shard_map wrap + padding
    overhead, which is the only kernel-path scaling fact measurable
    without a second chip.
  * virtual CPU mesh fallback: the efficiency sweep uses the XLA path
    (kernels interpret off-TPU, which times Python, not hardware); the
    kernel path is still executed once sharded to validate it end-to-end,
    and is timed only on TPU.

    python bench_scaling.py [--n 1048576] [--rank 10] [--devices 1,2,4,8]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from functools import partial

import jax

if os.environ.get("PSGD_SCALING_VIRTUAL") == "1":
    # re-exec'ed fallback: must run before any backend initialization
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _median_time(fn, reps=3):
    """Median wall time + relative spread (error-bar policy of bench.py:
    a best-of with no recorded spread let a 25% artifact discrepancy go
    unnoticed in r3)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[reps // 2]
    return med, (ts[-1] - ts[0]) / max(med, 1e-12)


def bench_mesh(
    n_devices: int, n: int, rank: int, iters: int = 30, path: str = "xla"
):
    """Returns (nnz/s, rel spread) for one mesh size."""
    from psgd_tf_tpu.groups import lra
    from psgd_tf_tpu.ops import pallas as pallas_ops
    from psgd_tf_tpu.parallel import make_mesh, precond_sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=1, shard=n_devices, devices=jax.devices()[:n_devices])
    key = jax.random.PRNGKey(0)
    state = lra.init(key, n, rank=rank)
    sh = precond_sharding(mesh, state)
    vec = NamedSharding(mesh, P("shard"))
    rep = NamedSharding(mesh, P())

    state = jax.device_put(state, sh)
    v = jax.device_put(jax.random.normal(key, (n,)), vec)
    h = jax.device_put(jax.random.normal(jax.random.fold_in(key, 1), (n,)), vec)
    g = jax.device_put(jax.random.normal(jax.random.fold_in(key, 2), (n,)), vec)

    def update_apply(state, v, h, g, key):
        if path == "kernel":
            with pallas_ops.sharding(mesh):
                st = lra.update(state, v, h, step=0.001, key=key)
        else:
            with pallas_ops.disabled():
                st = lra.update(state, v, h, step=0.001, key=key)
        return st, lra.apply(st, g)

    def chained(state, v, h, g, key):
        def body(carry, _):
            st, out = update_apply(carry, v, h, g, key)
            return st, None

        return jax.lax.scan(body, state, None, length=iters)[0]

    chained_j = jax.jit(
        chained, in_shardings=(sh, vec, vec, vec, rep), out_shardings=sh
    )
    out = chained_j(state, v, h, g, key)
    jax.block_until_ready(out)
    t, rel = _median_time(lambda: jax.block_until_ready(chained_j(state, v, h, g, key)))
    nnz = 2 * n * rank + n
    return nnz / (t / iters), rel


def bench_tpu_single_chip(n: int, rank: int, iters: int = 30) -> dict:
    """One real chip: shard_map'd kernel on a 1-device mesh vs the raw
    fused kernel — the wrap overhead that bounds kernel-path scaling."""
    from psgd_tf_tpu.groups import lra
    from psgd_tf_tpu.ops import linalg, pallas as pallas_ops
    from psgd_tf_tpu.ops.pallas import lra_upd
    from psgd_tf_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, shard=1)
    key = jax.random.PRNGKey(0)
    state = lra.init(key, n, rank=rank)
    v = jax.random.normal(key, (n,))
    h = jax.random.normal(jax.random.fold_in(key, 1), (n,))
    t = linalg.tiny(jax.numpy.float32)

    def chain(fn):
        def body(carry, _):
            UV, d = fn(carry[0], carry[1])
            return (UV, d), None

        def run(UV, d):
            return jax.lax.scan(body, (UV, d), None, length=iters)[0]

        return jax.jit(run)

    raw = chain(
        lambda UV, d: lra_upd.fused_update(UV, d, v, h, 0.001, key, t)
    )
    wrapped = chain(
        lambda UV, d: lra_upd.fused_update_sharded(
            UV, d, v, h, 0.001, key, t, mesh=mesh
        )
    )
    nnz = 2 * n * rank + n
    out = {}
    for name, fn in [("raw_kernel", raw), ("shardmap_kernel", wrapped)]:
        o = fn(state.UV, state.d)
        jax.block_until_ready(o)
        tt, rel = _median_time(lambda: jax.block_until_ready(fn(state.UV, state.d)))
        out[name] = nnz / (tt / iters)
        out[name + "_rel_spread"] = rel
        log(f"1-chip {name}: {out[name] / 1e9:8.2f} Gnnz/s (spread {rel:.1%})")
    out["shardmap_overhead"] = out["raw_kernel"] / out["shardmap_kernel"]
    return out


def comm_models(n: int, rank: int) -> dict:
    """Analytic bytes-exchanged-per-sharded-step per family
    (parallel/overlap.comm_model): computable today, measurable when
    multi-chip hardware exists (VERDICT r2 item 6). The state-sharding
    ('shard' axis) payloads are RANK-SPACE only by design; the
    data-parallel gradient+Hvp reduction dominates every family and is
    common to any DP optimizer."""
    from jax.sharding import PartitionSpec as P

    from psgd_tf_tpu.parallel import overlap

    out = {
        fam: overlap.comm_model(fam, n, rank)
        for fam in ("lra", "splu", "dense", "diag", "xmat", "shift", "kron")
    }
    # the kron-tp dryrun config (__graft_entry__.dryrun_multichip): six
    # (24, 24) params alternating col-/row-sharded over shard=2 — the
    # per-param DP + gather accounting the TP path actually incurs
    shapes = [(24, 24)] * 6
    specs = [P(None, "shard") if i % 2 == 0 else P("shard", None)
             for i in range(6)]
    out["kron-tp-dryrun"] = overlap.comm_model(
        "kron", rank=rank, param_shapes=shapes, param_specs=specs,
        mesh_shape={"data": 4, "shard": 2},
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--rank", type=int, default=10)
    ap.add_argument("--devices", default=None, help="comma list, e.g. 1,2,4,8")
    ap.add_argument("--path", default="auto", choices=["auto", "kernel", "xla"])
    args = ap.parse_args()

    if jax.default_backend() == "tpu" and jax.device_count() == 1:
        res = bench_tpu_single_chip(args.n, args.rank)
        print(
            json.dumps(
                {
                    "metric": "lra_shardmap_kernel_1chip",
                    "value": round(res["shardmap_kernel"] / 1e9, 3),
                    "unit": "Gnnz/s (vs raw kernel, 1 real TPU chip)",
                    "vs_baseline": round(1.0 / res["shardmap_overhead"], 4),
                    "detail": {k: round(v, 4) for k, v in res.items()},
                    "comm_model": comm_models(args.n, args.rank),
                }
            )
        )
        return

    if jax.device_count() == 1 and os.environ.get("PSGD_SCALING_VIRTUAL") != "1":
        # single local chip: re-exec onto a virtual CPU mesh to validate
        # the harness + sharding math (NOT an interconnect measurement);
        # backends can't be reconfigured once initialized, hence re-exec
        log("single device: re-exec on 8-device virtual CPU mesh")
        env = dict(os.environ, PSGD_SCALING_VIRTUAL="1")
        sys.exit(subprocess.run([sys.executable] + sys.argv, env=env).returncode)
    backend = jax.default_backend()
    avail = jax.device_count()
    sizes = (
        [int(s) for s in args.devices.split(",")]
        if args.devices
        else [d for d in (1, 2, 4, 8) if d <= avail]
    )
    path = args.path
    if path == "auto":
        path = "kernel" if backend == "tpu" else "xla"
    log(f"backend={backend} devices={avail} mesh sizes={sizes} path={path}")

    if backend != "tpu":
        # execute (don't time) the sharded kernel path once: end-to-end
        # validation that the shard_map'd kernels run on this mesh
        kn, _ = bench_mesh(sizes[-1], 1 << 12, args.rank, iters=2, path="kernel")
        log(f"kernel-path sharded execution validated at {sizes[-1]} devices")

    results = {}
    base = None
    for d in sizes:
        nps, rel = bench_mesh(d, args.n, args.rank, path=path)
        if base is None:
            base = nps
        eff = nps / (base * d)
        results[str(d)] = {"nnz_per_sec": nps, "efficiency": eff,
                           "rel_spread": rel}
        log(f"shard={d}: {nps/1e9:8.2f} Gnnz/s  efficiency {eff:6.1%} "
            f"(spread {rel:.1%})")

    last = sizes[-1]
    print(
        json.dumps(
            {
                "metric": "lra_sharded_scaling_efficiency",
                "value": round(results[str(last)]["efficiency"], 4),
                "unit": f"fraction at {last} devices ({backend}, {path} path)",
                "vs_baseline": round(results[str(last)]["efficiency"] / 0.8, 4),
                "detail": {
                    k: {kk: round(vv, 4) for kk, vv in v.items()}
                    for k, v in results.items()
                },
                "comm_model": comm_models(args.n, args.rank),
            }
        )
    )


if __name__ == "__main__":
    main()
