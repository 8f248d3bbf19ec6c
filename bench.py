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


def _sync(out) -> float:
    # fetch an actual VALUE: on relayed/async backends block_until_ready
    # can complete before the device finishes, so a device->host read of a
    # result element is the only hard barrier
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def time_chained(step_fn, make_state, iters: int = 100, reps: int = 3):
    """Per-iteration *device* time of `state -> state`, measured as the
    slope between a short and a long scan-chained execution.

    Chaining iterations through one lax.scan makes the measurement honest
    against dispatch pipelining and request caches (sequential data
    dependencies; fresh inputs per rep). But a single execution also pays a
    fixed host->device round-trip — measured ~23 ms through this TPU tunnel,
    which at iters=200 would pollute every per-iteration figure by >100 us.
    Timing the SAME body at two chain lengths and taking
    (t_long - t_short) / (iters_long - iters_short) cancels the fixed cost;
    a trivial scan body measures ~1.5 us/iter this way (vs ~120 us/iter
    naively at length 200)."""

    def build(length):
        @jax.jit
        def run(state):
            return jax.lax.scan(
                lambda c, _: (step_fn(c), None), state, None, length=length
            )[0]
        return run

    # Adapt the chain length so the long run dwarfs the ~25ms round-trip
    # noise: a cheap body (tens of us) at iters=100 would otherwise hand
    # the slope over to tunnel jitter. Estimate per-iter cost from a warm
    # short run, then size the long chain to >= ~0.4s of device work.
    short = iters
    run_s = build(short)
    _sync(run_s(make_state(0)))
    t0 = time.perf_counter()
    _sync(run_s(make_state(99)))
    est = max((time.perf_counter() - t0 - 0.023) / short, 1e-7)
    long_ = min(max(5 * short, int(0.4 / est)), 50 * short)
    run_l = build(long_)
    _sync(run_l(make_state(0)))

    slopes = []
    for rep in range(1, reps + 1):
        state = make_state(rep)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        _sync(run_s(state))
        t_s = time.perf_counter() - t0
        state = make_state(rep + 100)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        _sync(run_l(state))
        t_l = time.perf_counter() - t0
        slopes.append((t_l - t_s) / (long_ - short))
    slopes.sort()
    med = slopes[len(slopes) // 2]  # median: robust to tunnel jitter
    # every rep's slope travels with the result so the headline artifact
    # carries its own error bars (VERDICT r3: best-of-3 with no recorded
    # spread let a 25% splu disagreement between artifacts go unnoticed)
    spread = {
        "slopes_us": [round(s * 1e6, 3) for s in slopes],
        "rel_spread": round((slopes[-1] - slopes[0]) / max(med, 1e-12), 4),
    }
    return med, spread


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

    def build(length):
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
                body, (params, state, key), jnp.arange(length)
            )
            return params, state, losses[-1]
        return train

    short, long_ = chain, 5 * chain
    run_s, run_l = build(short), build(long_)
    float(run_s(params, state, key)[2])  # warm both compiles; hard sync
    float(run_l(params, state, key)[2])
    slopes = []
    for rep in range(1, 4):
        # fresh key per rep: identical request payloads can be served from
        # execution caches on relayed backends, overstating throughput.
        # Slope between short and long chains cancels the fixed per-execution
        # tunnel round-trip (see time_chained).
        k1, k2 = jax.random.PRNGKey(rep), jax.random.PRNGKey(rep + 100)
        jax.block_until_ready((k1, k2))
        t0 = time.perf_counter()
        float(run_s(params, state, k1)[2])
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_l(params, state, k2)[2])
        t_l = time.perf_counter() - t0
        slopes.append((t_l - t_s) / (long_ - short))
    return 1.0 / min(s for s in slopes if s > 0)


def measure_stream_bw(n: int = 1 << 25) -> float:
    """Achievable HBM stream bandwidth (GB/s): a saxpy whose working set
    (128 MB at the default n) exceeds v5e's VMEM, forcing HBM residency.
    Smaller working sets run VMEM-resident on this chip (a 64 MB saxpy
    measures ~49 TB/s), so per-family speed-of-light ratios below can
    legitimately exceed 1.0 when the family's state fits VMEM."""
    step = jax.jit(lambda x: x * 1.0000001 + 0.5)
    dt, _ = time_chained(
        step,
        lambda rep: jax.random.normal(jax.random.PRNGKey(rep), (n,)),
        iters=30,
    )
    return 8.0 * n / dt / 1e9


# HBM stream laws, measured r5 (tools/stream_probe.py: 512MB buffers,
# 4MB blocks, 5-rep chained slopes, spreads <= 5%): pallas streaming at
# this operating point is FLAT in buffer count — read-only sustains
# ~750 GB/s aggregate for k = 1..4 separate buffers and read+write ~660
# (numerically equal to the XLA saxpy bound, cross-validating the
# harness). The r3 "per-buffer law" (226 GB/s x k, the previous ledger's
# denominators) does NOT reproduce there and is RETIRED as a ceiling:
# it was an operating point of small working sets and a noisier harness,
# not a DMA-concurrency property (history in CLAUDE.md). Each row below
# is judged against the law for its schedule's dominant direction mix —
# kernels whose big streams are pure reads (the kron probe sweeps)
# against READ, kernels that rewrite their state in the same pass
# against MIXED.
STREAM_LAW = {"read": 750.0, "mixed": 660.0}

ROUTED_LAW = {
    "diag": "mixed",      # q read + q' written (VMEM-resident anyway)
    "xmat": "mixed",
    "shift": "mixed",
    "lra": "mixed",       # packed (2r, n) UV read 3x + written once
    "splu": "mixed",      # VMEM-resident single launch: latency-bound
    "splu_big": "mixed",  # rank-major tails read 3x + written once
    "dense": "mixed",     # Q read twice + Q' written once
    "kron_nd": "read",    # dX, dG probe panels; factor outputs are O(m+n)
    "kron_ns": "read",
    "kron_ns_wide": "read",
    "kron_ds": "read",
}


def _law_ceiling(kind: str) -> float:
    return STREAM_LAW[kind]


def measure_mxu_peak(n: int = 4096) -> float:
    """Achieved bf16 MXU peak (FLOP/s): chained (n, n) @ (n, n) bf16
    matmuls. The weight is scaled so iterates decay (no inf/nan churn);
    the MXU does not care about values. This measured figure — not the
    spec sheet — is the denominator of every `% of MXU peak` column, so
    compute-bound rows are judged against what a dense large matmul
    actually achieves through this compiler/runtime."""
    key = jax.random.PRNGKey(0)
    w = (0.5 * n**-0.5 * jax.random.normal(key, (n, n))).astype(jnp.bfloat16)
    step = jax.jit(
        lambda x: jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
    )
    dt, _ = time_chained(
        step,
        lambda rep: jax.random.normal(
            jax.random.PRNGKey(rep), (n, n)
        ).astype(jnp.bfloat16),
        iters=50,
    )
    return 2.0 * n**3 / dt


def family_mxu_flops(family: str, n: int, rank: int = 10) -> float:
    """Modeled MXU flops per update+apply pair, in BF16-EQUIVALENT flops:
    dots pinned to Precision.HIGHEST (the solve-precision invariant,
    CLAUDE.md) count 6x their nominal flops — Mosaic emulates an fp32 GEMM
    as 6 bf16 MXU passes. Statistical GEMMs ride default (1x bf16).

      diag/xmat/shift : pure VPU elementwise — no MXU term.
      lra   : rank-space Grams + projections over the packed (2r, n)
              state: stage-1 Z Z^T + the apply Gram + the two projection
              writes ~ 6 (2r+2)^2 n nominal, default precision.
      splu  : tail products ~ 3 passes x ~10 r n nominal, default.
      dense : rank-2 update form: Qh + a(a^T Q) - b(b^T Q) + apply
              Q^T(Q g) ~ 8 matvecs = 16 n^2 nominal; the solve's 2 n^2
              ride HIGHEST (+10 n^2 equivalent) -> 26 n^2.

    These are MODELS (documented, not profiled per-op); the binding
    column they feed says which roofline — HBM stream law or MXU — the
    row's measured time is closest to, making BASELINE.md's
    "speed-of-light per chip" claim checkable for compute-bound rows
    (VERDICT r4 ask #5)."""
    z = 2 * rank + 2
    return {
        "diag": 0.0,
        "xmat": 0.0,
        "shift": 0.0,
        "lra": 6.0 * z * z * n,
        "splu": 30.0 * rank * n,
        "splu_big": 30.0 * rank * n,
        "dense": 26.0 * float(n) * n,
    }[family]


# Modeled bf16-equivalent MXU flops per kron update+apply pair at probe
# (m, n) — same pass accounting as family_mxu_flops, with the block
# substitution at its ROUTED bf16x3 mode (3 MXU passes, r5; HIGHEST
# would be 6):
#   nd : A (2mn^2) + substitution @bf16x3 (2mn^2 -> 6) + two Grams
#        (4mn^2) + XLA apply chain (4mn^2)            -> 16 m n^2
#   ds : mirror of nd on the m side                   -> 16 m^2 n
#   ns / ns_wide : diagonal right factor — only the bias matvec, the
#        btdot matvec and the apply's elementwise chain touch reductions;
#        ~8 m n nominal, effectively VPU-class        -> 8 m n
KRON_MXU_FLOPS = {
    "kron_nd": lambda m, n: 16.0 * m * float(n) * n,
    "kron_ns": lambda m, n: 8.0 * float(m) * n,
    "kron_ns_wide": lambda m, n: 8.0 * float(m) * n,
    "kron_ds": lambda m, n: 16.0 * float(m) * m * n,
}


def _roofline(results: dict, rowname: str, dt: float, gbs: float,
              law: float, flops: float, mxu_peak: float | None) -> str:
    """Record the MXU column + binding tag for one row; returns the
    ledger suffix. Binding = whichever roofline (HBM per-buffer law vs
    measured MXU peak) predicts more of the measured time."""
    if not mxu_peak:
        return ""
    pct_mxu = flops / dt / mxu_peak
    results[f"{rowname}_mxu_flops_model"] = flops
    results[f"{rowname}_pct_of_mxu_peak"] = pct_mxu
    if not law:
        # row already above the HBM stream laws (VMEM residency or
        # hot-page reuse): neither roofline binds it
        results[f"{rowname}_binding"] = "above-law"
        return f" | MXU {pct_mxu:5.1%}"
    t_hbm = gbs / law                             # fraction of dt at law
    binding = "MXU" if pct_mxu > t_hbm else "HBM"
    results[f"{rowname}_binding"] = binding
    return f" | MXU {pct_mxu:5.1%} -> {binding}-bound"


def family_traffic_bytes(family: str, n: int, rank: int = 10) -> float:
    """Analytic HBM bytes per update+apply pair for the ROUTED schedule
    (fp32, each array touched once per pass; perfect fusion assumed):

      diag : update reads q,v,h + writes q' (4n); apply reads q',g +
             writes out (3n)                                  -> 28n B
      xmat : folded (2, m) state = 2n values; update reads state(2n),
             v,h(2n) + writes state'(2n); apply reads state'(2n), g +
             writes out                                       -> 40n B
      shift: same folded (2, m) state and pass structure as xmat -> 40n B
      lra  : two streaming passes over U,V (stage 1 Gram, stage 3 write
             with the apply Gram riding it) + the stage-4 apply pass +
             vectors incl. the deferred-d XLA map
             (ops/pallas/lra_upd.py traffic model)    -> (8nr + 15n) * 4 B
      splu : VMEM-resident single launch at bench sizes: state read once
             + written once (4nr tails+corners) + probe/out vectors
             (ops/pallas/splu_one.py)                 -> (4nr + 10n) * 4 B
      splu_big: beyond the VMEM budget the 3-pass streaming schedule on
             the KERNEL-LAYOUT state (splu_upd.py + SpLUStreamState,
             r5) moves, PHYSICALLY (padded rp sublane rows — what the
             DMA moves; the r5 attribution showed the old logical
             10nr+12n model undercounting by 1.6x): stages 1/2 read
             2rp+4 rows/lane each, stage 3 reads 2rp+4 + writes 2rp+2,
             and the padded-field XLA apply reads each tail twice
             (dependent matvecs) + vectors + out = 4rp+7
             -> (12 rp + 21) rows/lane * 4 B
      dense: gridded fused update+apply: Q read twice (probe pass, update
             sweep) + written once, P'g riding the sweep
             (ops/pallas/dense_big.py)                     -> 3n^2 * 4 B
    """
    return 4.0 * {
        "diag": 7 * n,
        "xmat": 10 * n,
        "shift": 10 * n,
        "lra": 8 * n * rank + 15 * n,
        "splu": 4 * n * rank + 10 * n,
        # physical rows/lane on the padded stream state; see docstring
        "splu_big": (12 * max(8, -(-rank // 8) * 8) + 21) * n,
        "dense": 3 * n * n,
    }[family]


def family_nnz(family: str, n: int, rank: int = 10) -> int:
    """Preconditioner state entries touched per update+apply pair."""
    family = family.split("_")[0]
    return {
        "lra": 2 * n * rank + n,
        "splu": 2 * n * rank + 2 * (n - rank),
        "dense": n * (n + 1) // 2,
        "diag": n,
        "xmat": 2 * n,
        "shift": 2 * n,
    }[family]


def bench_family_nnz_per_sec(family: str, n: int, rank: int = 10,
                             iters: int = 100, dtype=jnp.float32):
    """Sequential update+apply throughput on a flat n-parameter problem.
    Returns (nnz/s, slope spread dict). `dtype=bfloat16` benches the
    production bf16-state path — which rides the XLA formulation (the
    pallas kernels are fp32-only by the solve-precision invariant)."""
    from psgd_tf_tpu.groups import base

    family = family.split("_")[0]  # splu_big -> splu (streaming regime row)
    fam = base.FLAT_FAMILIES[family]

    def make_state(rep: int):
        key = jax.random.PRNGKey(rep)
        if family == "lra":
            st = fam.init(key, n, rank=rank, dtype=dtype)
        elif family == "splu":
            st = fam.init(n, rank=rank, dtype=dtype)
        else:
            st = fam.init(n, dtype=dtype)
        v = jax.random.normal(jax.random.fold_in(key, 1), (n,), dtype)
        h = jax.random.normal(jax.random.fold_in(key, 2), (n,), dtype)
        return st, v, h, key

    nnz = family_nnz(family, n, rank)

    def step(carry):
        st, v, h, key = carry
        key = jax.random.fold_in(key, 7)
        if hasattr(fam, "update_apply"):
            # the optimizer's production path: fused Q-update + precondition
            st, pre = fam.update_apply(st, v, h, v, step=1e-4, key=key)
        else:
            st = fam.update(st, v, h, step=1e-4, key=key)
            pre = fam.apply(st, v)
        # thread the apply result back so neither op is dead code
        return st, v + 1e-30 * pre, h, key

    dt, spread = time_chained(step, make_state, iters=iters)
    return nnz / dt, spread


def bench_kron_sparse_gelem_per_sec(
    fmt: tuple[str, str], shape: tuple[int, int], passes: int | None = None,
    iters: int = 10,
):
    """Sparse-format Kronecker update+apply throughput at reference-envelope
    probe shapes (ref README.md:54: (norm, dense) to [1e6, 1e3],
    (norm, scale) to [1e6, 1e6] of STATE; the m x n PROBES bound what any
    implementation can materialize). Returns (probe Gelem/s, model GB/s):
    elem = m*n per update+apply pair; the traffic model is the routed
    streaming schedule (kron_sparse_big.py): dG once + dX twice for the
    arrow-coupled pairs (3mn; single-pass impossible — the last-row
    correction gates the bias reduction), 2mn for (dense, scale), plus
    2mn for the apply's G read + out write.
    """
    from psgd_tf_tpu.groups import kron

    m, n = shape
    arrow = "norm" in fmt
    if passes is None:
        passes = (3 if arrow else 2) + 2

    def make_state(rep: int):
        key = jax.random.PRNGKey(rep)
        st = kron.init(shape, fmt=fmt, init_scale=0.9)
        dX = jax.random.normal(jax.random.fold_in(key, 1), shape)
        dG = jax.random.normal(jax.random.fold_in(key, 2), shape)
        return st, dX, dG

    def step(carry):
        st, dX, dG = carry
        st = kron.update(st, dX, dG, step=1e-4)
        out = kron.apply(st, dG)
        # thread the apply result as the NEXT Hvp probe: a full data
        # dependency (so neither op is dead code) with ZERO extra
        # traffic. The previous `dX + 1e-30 * out` threading
        # MATERIALIZED a fresh copy of dX every iteration — +3x probe
        # bytes (+6 GB/iter at the wide shapes, ~9 ms of a 24.7 ms
        # measurement) — quietly inflating every kron row in r3/r4/r5
        # artifacts (measured r5, /tmp/r5/ns_apply_ab.py postmortem).
        # Values: P ~ (0.9)^4 I per apply, so dG decays ~0.66x/iter;
        # chain lengths here stay far from the ~1e-38 flush point, and
        # the op count is value-independent.
        return st, dX, out

    dt, spread = time_chained(step, make_state, iters=iters, reps=3)
    elems = float(m) * float(n)
    return elems / dt, passes * elems * 4.0 / dt / 1e9, spread


def bench_nmt_step_us(exact: bool = False) -> float:
    """Full PSGD training-step time on the NMT flagship (mixed per-layer
    kron formats, ref nmt:99-148), batch 64 — FD Hvp by default (the
    reference's noted-faster configuration, ref nmt:239-240)."""
    from psgd_tf_tpu import PSGD
    from psgd_tf_tpu.data import translation
    from psgd_tf_tpu.models import nmt

    cfg = nmt.Config()
    key = jax.random.PRNGKey(0)
    params = nmt.init(key, cfg)
    src, tgt = translation.batch(jax.random.fold_in(key, 1), 64, 16)
    opt = PSGD(
        preconditioner="kron", kron_formats=nmt.kron_formats(cfg),
        lr_params=0.05, lr_preconditioner=0.05, grad_clip_max_norm=1.0,
        exact_hessian_vector_product=exact,
    )
    state = opt.init(params, key)

    def step(carry):
        p, s, k = carry
        k, sub = jax.random.split(k)
        p, s, _ = opt.step(nmt.loss, p, s, sub, src, tgt)
        return (p, s, k)

    dt, spread = time_chained(
        step, lambda rep: (params, state, jax.random.PRNGKey(rep)), iters=30
    )
    return dt * 1e6, spread


def bench_nmt_ref_dims(iters: int = 8):
    """The NMT workload at the REFERENCE's real dimensions (VERDICT r4
    ask #1 — the one reference workload never measured at reference
    scale): embed 256, units 1024, vocab 9414/4935, batch 64, sequence
    lengths 16/11 (ref :68-86; `models.nmt.ref_config`). Tokens are
    synthetic — the kernels measure identically on random ids.

    Returns (phases dict in us, routes dict). Phases are CUMULATIVE
    (the r3 floor-decomposition shape, VALIDATION.md): value_and_grad /
    + FD Hvp pair / + kron Q-update / full PSGD step (apply + clip +
    descend). Routes map each layer to the kernel `groups.kron.route`
    says serves it — the bench FAILS (raises) if any kron-routed layer
    silently rides the XLA fallback."""
    from psgd_tf_tpu import PSGD, hvp
    from psgd_tf_tpu.groups import kron
    from psgd_tf_tpu.models import nmt

    cfg = nmt.ref_config()
    key = jax.random.PRNGKey(0)
    params = nmt.init(key, cfg)
    src = jax.random.randint(
        jax.random.fold_in(key, 1), (64, 18), 3, cfg.vocab_src)
    tgt = jax.random.randint(
        jax.random.fold_in(key, 2), (64, 13), 3, cfg.vocab_tgt)

    fmts = nmt.kron_formats(cfg)
    shapes = nmt.layer_shapes(cfg)
    routes = {}
    for (m, n), fmt in zip(shapes, fmts):
        r = kron.route(fmt, (m, n))
        routes[f"{fmt[0][0]}{fmt[1][0]}_{m}x{n}"] = r
        # the (1, 10) attention-output layer is latency-trivial either
        # way; every other layer must hit a kernel
        if r == "xla" and m * n > 512:
            raise RuntimeError(
                f"nmt_ref_dims: layer {fmt} {(m, n)} routes to the XLA "
                "fallback — kernel coverage regressed")
    log(f"nmt_ref routes: {routes}")

    opt = PSGD(
        preconditioner="kron", kron_formats=fmts,
        lr_params=0.02, lr_preconditioner=0.02, grad_clip_max_norm=1.0,
        exact_hessian_vector_product=False,
    )
    state = opt.init(params, key)
    lr_pre = 0.02

    def tree_fold(p, *trees):
        # fold outputs back into the carry so no phase is dead code
        out = p
        for tr in trees:
            out = jax.tree_util.tree_map(
                lambda a, g: a - 1e-30 * g.astype(a.dtype), out, tr)
        return out

    def ph_grad(carry):
        p, pc, k = carry
        k = jax.random.fold_in(k, 1)
        _, grads = hvp.grad_only(nmt.loss, p, src, tgt)
        return tree_fold(p, grads), pc, k

    def ph_hvp(carry):
        p, pc, k = carry
        k = jax.random.fold_in(k, 1)
        v = hvp.random_like(k, p)
        _, grads, hvs = hvp.finite_diff(nmt.loss, p, v, src, tgt)
        return tree_fold(p, grads, hvs), pc, k

    def ph_qupd(carry):
        p, pc, k = carry
        k = jax.random.fold_in(k, 1)
        v = hvp.random_like(k, p)
        _, grads, hvs = hvp.finite_diff(nmt.loss, p, v, src, tgt)
        v_l = [x.astype(jnp.float32) for x in v]
        h_l = [x.astype(jnp.float32) for x in hvs]
        pc = kron.update_multi(pc, v_l, h_l, step=lr_pre)
        return tree_fold(p, grads), pc, k

    def ph_full(carry):
        p, s, k = carry
        k, sub = jax.random.split(k)
        p, s, _ = opt.step(nmt.loss, p, s, sub, src, tgt)
        return p, s, k

    kron_states = [
        kron.init(s, fmt=f, init_scale=1.0) for s, f in zip(shapes, fmts)
    ]
    phases = {}
    for name, fn, carry0 in (
        ("grad", ph_grad, lambda rep: (params, kron_states,
                                       jax.random.PRNGKey(rep))),
        ("hvp", ph_hvp, lambda rep: (params, kron_states,
                                     jax.random.PRNGKey(rep))),
        ("qupd", ph_qupd, lambda rep: (params, kron_states,
                                       jax.random.PRNGKey(rep))),
        ("full", ph_full, lambda rep: (params, state,
                                       jax.random.PRNGKey(rep))),
    ):
        dt, spread = time_chained(fn, carry0, iters=iters)
        phases[name] = {"us": dt * 1e6, "spread": spread}
        log(f"nmt_ref phase {name:4s}: {dt * 1e6:8.0f} us "
            f"(spread {spread['rel_spread']:.1%})")
    return phases, routes


def main():
    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    results = {}
    stream_bw = measure_stream_bw() if backend == "tpu" else None
    mxu_peak = None
    if stream_bw:
        results["hbm_stream_gb_per_sec"] = stream_bw
        log(f"HBM stream bound (128MB saxpy): {stream_bw:.0f} GB/s")
        mxu_peak = measure_mxu_peak()
        results["mxu_bf16_peak_flops"] = mxu_peak
        log(f"MXU bf16 peak (4096^3 chained matmul): "
            f"{mxu_peak / 1e12:.1f} TFLOP/s")

    # (row name, family, n, chain iters). The three dense rows track every
    # routed schedule: resident <= 1536 is covered by LeNet5; 4096 = BLK=256
    # gridded; 8192 = largest BLK=256 size (the r3 scoped-VMEM bug point);
    # 16384 = BLK_BIG cap (VERDICT r3 weak #3: the gridded regime had
    # correctness coverage but no tracked throughput).
    rows = [
        ("diag", "diag", 1 << 22, 100, jnp.float32),
        ("xmat", "xmat", 1 << 22, 100, jnp.float32),
        ("shift", "shift", 1 << 22, 100, jnp.float32),
        ("lra", "lra", 1 << 20, 100, jnp.float32),
        # the production bf16-state path (XLA formulation — kernels are
        # fp32-only): quantifies the traffic-halving claim at bf16 byte
        # accounting (VERDICT r4 ask #8)
        ("lra_bf16", "lra", 1 << 20, 100, jnp.bfloat16),
        ("splu", "splu", 1 << 16, 100, jnp.float32),
        ("splu_big", "splu_big", 1 << 20, 100, jnp.float32),
        ("dense", "dense", 1 << 12, 100, jnp.float32),
        ("dense_8k", "dense", 1 << 13, 20, jnp.float32),
        ("dense_16k", "dense", 1 << 14, 8, jnp.float32),
    ]
    for rowname, famname, n, iters, dtype in rows:
        try:
            nps, spread = bench_family_nnz_per_sec(
                famname, n, iters=iters, dtype=dtype)
            results[f"{rowname}_nnz_per_sec"] = nps
            results[f"{rowname}_slopes_us"] = spread["slopes_us"]
            results[f"{rowname}_rel_spread"] = spread["rel_spread"]
            sol = ""
            if stream_bw:
                nnz = family_nnz(famname, n)
                el_bytes = jnp.dtype(dtype).itemsize
                gbs = (family_traffic_bytes(famname, n) * (el_bytes / 4.0)
                       * (nps / nnz) / 1e9)
                frac = gbs / stream_bw
                kind = ROUTED_LAW[famname]
                law = _law_ceiling(kind)
                results[f"{rowname}_pct_of_stream_bound"] = frac
                results[f"{rowname}_achieved_gb_per_sec"] = gbs
                dt = nnz / nps
                flops = family_mxu_flops(famname, n)
                if dtype != jnp.float32:
                    # XLA path (kernels fp32-only): report traffic vs the
                    # saxpy bound only
                    sol = (f"  traffic {gbs:6.0f} GB/s = {frac:5.1%} of "
                           f"HBM bound (XLA path, {el_bytes}B state)")
                elif frac > 1:
                    # above the HBM bound: VMEM-resident working set, or
                    # a multi-pass schedule re-touching just-written
                    # arrays (hot-page reuse beats the cold-stream laws
                    # — the aliased splu_big schedule measures ~135% of
                    # the mixed law on its physical byte model, r5)
                    sol = (f"  traffic {gbs:6.0f} GB/s = {frac:5.1%} of "
                           "HBM bound (VMEM-resident / hot-page reuse)")
                    sol += _roofline(results, rowname, dt, gbs, 0.0,
                                     flops, mxu_peak)
                else:
                    results[f"{rowname}_pct_of_{kind}_law"] = gbs / law
                    sol = (
                        f"  traffic {gbs:6.0f} GB/s = {frac:5.1%} of HBM "
                        f"bound | {gbs / law:5.1%} of {kind} law "
                        f"({law:.0f})"
                    )
                    sol += _roofline(results, rowname, dt, gbs, law,
                                     flops, mxu_peak)
            log(f"{rowname:8s} n={n:>8d}  {nps/1e9:8.3f} Gnnz/s"
                f" (spread {spread['rel_spread']:.1%}){sol}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            log(f"{rowname} bench failed: {exc}")

    # sparse-format kron pairs at reference-envelope probe shapes
    # (README.md:54) — streamed by kron_sparse_big beyond the resident cap
    # (fmt, shape, traffic passes or None for the default model, iters).
    # kron_ns_wide: the wide-lane (norm, scale) path past the 131072
    # resident-lane cap (VERDICT r3 ask #4) — the m stays modest because
    # the m x n probe itself is the HBM limiter (a (1e4, 1e6) probe would
    # be 40 GB); r5 single-pass wide kernel: update = kernel 2mn + the
    # corr-gated btdot matvec 1mn, apply 2mn -> 5.
    kron_shapes = {
        "kron_nd": (("norm", "dense"), (131072, 512), None, 10),
        "kron_ns": (("norm", "scale"), (65536, 8192), None, 10),
        "kron_ns_wide": (("norm", "scale"), (512, 1_000_000), 5, 6),
        "kron_ds": (("dense", "scale"), (512, 131072), None, 10),
    }
    for name, (fmt, shape, passes, iters) in kron_shapes.items():
        try:
            gps, gbs, spread = bench_kron_sparse_gelem_per_sec(
                fmt, shape, passes=passes, iters=iters
            )
            results[f"{name}_gelem_per_sec"] = gps / 1e9
            results[f"{name}_slopes_us"] = spread["slopes_us"]
            results[f"{name}_rel_spread"] = spread["rel_spread"]
            sol = ""
            if stream_bw:
                frac = gbs / stream_bw
                kind = ROUTED_LAW[name]
                law = _law_ceiling(kind)
                results[f"{name}_pct_of_stream_bound"] = frac
                results[f"{name}_achieved_gb_per_sec"] = gbs
                results[f"{name}_pct_of_{kind}_law"] = gbs / law
                sol = (
                    f"  traffic {gbs:6.0f} GB/s = {frac:5.1%} of HBM bound"
                    f" | {gbs / law:5.1%} of {kind} law ({law:.0f})"
                )
                dt = float(shape[0]) * shape[1] / gps
                flops = KRON_MXU_FLOPS[name](*shape)
                sol += _roofline(results, name, dt, gbs, law, flops,
                                 mxu_peak)
            log(f"{name} {fmt} {shape}  {gps/1e9:8.3f} Gelem/s"
                f" (spread {spread['rel_spread']:.1%}){sol}")
        except Exception as exc:  # noqa: BLE001
            log(f"{name} bench failed: {exc}")

    try:
        nmt_us, nmt_spread = bench_nmt_step_us()
        results["nmt_fd_step_us"] = nmt_us
        results["nmt_fd_slopes_us"] = nmt_spread["slopes_us"]
        results["nmt_fd_rel_spread"] = nmt_spread["rel_spread"]
        log(f"nmt mixed-kron FD step (toy dims, vocab 32/embed 64/"
            f"units 128): {nmt_us:.0f} us/step "
            f"(spread {nmt_spread['rel_spread']:.1%})")
    except Exception as exc:  # noqa: BLE001
        log(f"nmt bench failed: {exc}")

    # the flagship at the REFERENCE's real dimensions (embed 256, units
    # 1024, vocab 9414/4935, batch 64) with floor decomposition and
    # verified kernel routing — VERDICT r4 ask #1
    try:
        phases, routes = bench_nmt_ref_dims()
        for pname, ph in phases.items():
            results[f"nmt_ref_{pname}_us"] = ph["us"]
            results[f"nmt_ref_{pname}_rel_spread"] = ph["spread"]["rel_spread"]
        results["nmt_ref_routes"] = sorted(
            f"{k}->{v}" for k, v in routes.items())
        log(f"nmt_ref_dims full FD step: {phases['full']['us']:.0f} us "
            f"(grad {phases['grad']['us']:.0f} / +hvp "
            f"{phases['hvp']['us']:.0f} / +qupd {phases['qupd']['us']:.0f})")
    except Exception as exc:  # noqa: BLE001
        log(f"nmt_ref_dims bench failed: {exc}")

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
                "detail": {
                    k: round(val, 3) if isinstance(val, (int, float))
                    else val
                    for k, val in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
