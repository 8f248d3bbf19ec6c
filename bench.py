"""Benchmark harness. Prints ONE JSON line on stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): LeNet5 digit-classification training
steps/sec at batch 64 with (dense, dense) Kronecker preconditioners — the
reference's canonical workload (/root/reference/mnist_with_lenet5.py). Also
measured and reported on stderr: preconditioner update+apply throughput
(nnz/s per chip) for every family, where nnz counts the preconditioner
state entries touched per update+apply pair.

The reference publishes no throughput numbers (SURVEY.md §6), so
`vs_baseline` compares against `BENCH_BASELINE.json` when present (written
by a previous round) and is 1.0 on the establishing run.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters: int = 50, warmup: int = 2):
    """Median-of-3 wall time per call, with donated-arg chaining disabled
    (args re-passed; callers should avoid donation)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def bench_lenet5_steps_per_sec(batch_size: int = 64, chain: int = 200) -> float:
    """Steps/sec of the full PSGD training step, measured as a
    scan-compiled training loop over pre-generated batches — the realistic
    compiled-training shape on TPU, and robust to host-dispatch latency."""
    from psgd_tf_tpu import PSGD
    from psgd_tf_tpu.data import mnist
    from psgd_tf_tpu.models import lenet5

    key = jax.random.PRNGKey(0)
    params = lenet5.init(key)
    num_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    opt = PSGD(
        preconditioner="kron",
        kron_formats=[("dense", "dense")] * 5,
        lr_params=0.1,
        lr_preconditioner=0.1,
        grad_clip_max_norm=0.1 * num_params**0.5,
    )
    state = opt.init(params, key)
    xs, ys = mnist.synthetic(key, batch_size * 8)
    xs = xs.reshape(8, batch_size, 28, 28, 1)
    ys = ys.reshape(8, batch_size)

    @jax.jit
    def train(params, state, key):
        def body(carry, i):
            params, state, key = carry
            key, sub = jax.random.split(key)
            p, s, aux = opt.step(
                lenet5.loss, params, state, sub, xs[i % 8], ys[i % 8]
            )
            return (p, s, key), aux["loss"]

        (params, state, _), losses = jax.lax.scan(
            body, (params, state, key), jnp.arange(chain)
        )
        return params, state, losses[-1]

    out = train(params, state, key)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = train(params, state, key)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / chain)
    return 1.0 / sorted(times)[1]


def bench_family_nnz_per_sec(family: str, n: int, rank: int = 10) -> float:
    """update+apply throughput on a flat n-parameter problem."""
    from psgd_tf_tpu.groups import base

    fam = base.FLAT_FAMILIES[family]
    key = jax.random.PRNGKey(0)
    if family == "lra":
        state = fam.init(key, n, rank=rank)
        nnz = 2 * n * rank + n
    elif family == "splu":
        state = fam.init(n, rank=rank)
        nnz = 2 * n * rank + 2 * (n - rank)
    elif family == "dense":
        state = fam.init(n)
        nnz = n * (n + 1) // 2
    else:
        state = fam.init(n)
        nnz = n if family == "diag" else 2 * n

    v = jax.random.normal(key, (n,))
    h = jax.random.normal(jax.random.fold_in(key, 1), (n,))
    g = jax.random.normal(jax.random.fold_in(key, 2), (n,))

    @jax.jit
    def update_apply(state, v, h, g, key):
        state = fam.update(state, v, h, step=0.01, key=key)
        return state, fam.apply(state, g)

    dt = time_fn(update_apply, state, v, h, g, key, iters=50)
    return nnz / dt


def main():
    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    results = {}
    sizes = {"diag": 1 << 22, "xmat": 1 << 22, "lra": 1 << 20, "splu": 1 << 16, "dense": 1 << 12}
    for famname, n in sizes.items():
        try:
            nps = bench_family_nnz_per_sec(famname, n)
            results[f"{famname}_nnz_per_sec"] = nps
            log(f"{famname:6s} n={n:>8d}  {nps/1e9:8.3f} Gnnz/s")
        except Exception as exc:  # noqa: BLE001 — report and continue
            log(f"{famname} bench failed: {exc}")

    sps = bench_lenet5_steps_per_sec()
    results["lenet5_steps_per_sec"] = sps
    log(f"lenet5 kron(dense,dense) batch=64: {sps:.2f} steps/s")

    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base_val = json.load(f).get("lenet5_steps_per_sec")
        if base_val:
            vs = sps / base_val

    print(
        json.dumps(
            {
                "metric": "lenet5_kron_steps_per_sec",
                "value": round(sps, 3),
                "unit": "steps/s",
                "vs_baseline": round(vs, 4),
                "detail": {k: round(val, 3) for k, val in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
