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


def time_chained(step_fn, make_state, iters: int = 30, reps: int = 3):
    """Per-iteration wall time of `state -> state` chained `iters` times
    inside ONE jitted lax.scan — sequential data dependencies make this an
    honest device-throughput measure (independent repeated dispatches
    overlap in the pipeline and can be served from request caches, both of
    which overstate throughput). Each rep uses fresh inputs."""

    @jax.jit
    def run(state):
        return jax.lax.scan(
            lambda c, _: (step_fn(c), None), state, None, length=iters
        )[0]

    def sync(out) -> float:
        # fetch an actual VALUE: on relayed/async backends
        # block_until_ready can complete before the device finishes, so a
        # device->host read of a result element is the only hard barrier
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(leaf.reshape(-1)[0])

    sync(run(make_state(0)))
    times = []
    for rep in range(1, reps + 1):
        state = make_state(rep)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        sync(run(state))
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


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
    float(out[2])  # hard sync (see time_chained)
    times = []
    for rep in range(1, 4):
        # fresh key per rep: identical request payloads can be served from
        # execution caches on relayed backends, overstating throughput
        k = jax.random.PRNGKey(rep)
        jax.block_until_ready(k)
        t0 = time.perf_counter()
        out = train(params, state, k)
        float(out[2])
        times.append((time.perf_counter() - t0) / chain)
    return 1.0 / min(times)


def bench_family_nnz_per_sec(family: str, n: int, rank: int = 10) -> float:
    """Sequential update+apply throughput on a flat n-parameter problem."""
    from psgd_tf_tpu.groups import base

    fam = base.FLAT_FAMILIES[family]

    def make_state(rep: int):
        key = jax.random.PRNGKey(rep)
        if family == "lra":
            st = fam.init(key, n, rank=rank)
        elif family == "splu":
            st = fam.init(n, rank=rank)
        else:
            st = fam.init(n)
        v = jax.random.normal(jax.random.fold_in(key, 1), (n,))
        h = jax.random.normal(jax.random.fold_in(key, 2), (n,))
        return st, v, h, key

    nnz = {
        "lra": 2 * n * rank + n,
        "splu": 2 * n * rank + 2 * (n - rank),
        "dense": n * (n + 1) // 2,
        "diag": n,
        "xmat": 2 * n,
    }[family]

    def step(carry):
        st, v, h, key = carry
        key = jax.random.fold_in(key, 7)
        st = fam.update(st, v, h, step=1e-4, key=key)
        pre = fam.apply(st, v)
        # thread the apply result back so neither op is dead code
        return st, v + 1e-30 * pre, h, key

    dt = time_chained(step, make_state)
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
