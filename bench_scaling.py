"""Scaling-efficiency harness: sharded preconditioner throughput vs mesh size.

BASELINE.md targets >= 80% nnz/s scaling efficiency from 1 chip to >= 2
hosts. This harness measures the row-sharded LRA update+apply (the
pod-scale family, SURVEY.md §2.4) across mesh sizes and reports efficiency
relative to the single-device run.

On real TPU pods run it unmodified (after `jax.distributed.initialize()`
on each host). With one local chip it falls back to a virtual CPU mesh
(deterministic, interconnect-free — validates the sharding math and the
harness itself, not ICI bandwidth; the printed backend says which).

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


def bench_mesh(n_devices: int, n: int, rank: int, iters: int = 30) -> float:
    from psgd_tf_tpu.groups import lra
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

    @partial(
        jax.jit,
        in_shardings=(sh, vec, vec, vec, rep),
        out_shardings=(sh, vec),
        static_argnums=(),
    )
    def update_apply(state, v, h, g, key):
        st = lra.update(state, v, h, step=0.001, key=key)
        return st, lra.apply(st, g)

    def chained(state, v, h, g, key):
        def body(carry, _):
            st, out = update_apply(carry, v, h, g, key)
            return st, None

        return jax.lax.scan(body, state, None, length=iters)[0]

    chained_j = jax.jit(chained)
    out = chained_j(state, v, h, g, key)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained_j(state, v, h, g, key)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    nnz = 2 * n * rank + n
    return nnz / sorted(ts)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--rank", type=int, default=10)
    ap.add_argument("--devices", default=None, help="comma list, e.g. 1,2,4,8")
    args = ap.parse_args()

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
    log(f"backend={backend} devices={avail} mesh sizes={sizes}")

    results = {}
    base = None
    for d in sizes:
        nps = bench_mesh(d, args.n, args.rank)
        if base is None:
            base = nps
        eff = nps / (base * d)
        results[str(d)] = {"nnz_per_sec": nps, "efficiency": eff}
        log(f"shard={d}: {nps/1e9:8.2f} Gnnz/s  efficiency {eff:6.1%}")

    last = sizes[-1]
    print(
        json.dumps(
            {
                "metric": "lra_sharded_scaling_efficiency",
                "value": round(results[str(last)]["efficiency"], 4),
                "unit": f"fraction at {last} devices ({backend})",
                "vs_baseline": round(results[str(last)]["efficiency"] / 0.8, 4),
                "detail": {
                    k: {kk: round(vv, 4) for kk, vv in v.items()}
                    for k, v in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
