"""Per-buffer DMA-stream law measurement (the denominators of bench.py's
`% of k-buf law` columns).

Measures the aggregate HBM bandwidth of a pallas kernel streaming K
SEPARATE input buffers concurrently, for K = 1..4 — the r3 experiment
(/tmp/dma_streams.py, CLAUDE.md) productionized so the law points are
reproducible and the 3-buffer figure is MEASURED rather than interpolated
(ADVICE r4).

Method honest against the tunnel + caches (CLAUDE.md timing rules):
  * inputs are FRESH HBM arrays per repetition — never scan carries (a
    carried operand stays VMEM-resident and reports >HBM-spec figures,
    the "1047 GB/s" artifact);
  * ONE pallas_call per timing (grid streams the whole working set), two
    working-set sizes, slope = (t_big - t_small) / (bytes_big -
    bytes_small) cancels the fixed ~23 ms host->device round trip;
  * device->host value read as the sync barrier;
  * median of 3 rep slopes, all slopes printed.

Run on the real chip:  python tools/stream_probe.py [total_mb]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 32768          # fp32 row = 128 KB
BLK_ROWS = 32          # 4 MB per-buffer block


def _kernel(*refs, k):
    ins, out = refs[:k], refs[k]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    acc = jnp.zeros((), jnp.float32)
    for r in ins:
        acc = acc + jnp.sum(r[:])
    out[:] += acc  # broadcast over the (1, 128) row (no scalar stores)


def _run_once(k: int, rows: int, interpret: bool = False):
    spec = pl.BlockSpec((BLK_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=(rows // BLK_ROWS,),
        in_specs=[spec] * k,
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=interpret,
        # k double-buffered 4MB blocks exceed the 16MB default scoped
        # limit at k >= 2 (measured: k=2 overran by 1KB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )


def _chained(kernel, n_sets):
    """One jit executing the kernel over `n_sets` INDEPENDENT fresh input
    sets via lax.scan whose xs (NOT carry) are the stacked arrays — every
    iteration reads a distinct HBM slice, and the whole chain is one
    execution, so per-execution tunnel noise cancels in the n_sets slope.
    (Two earlier methods failed here: single-execution size-slopes
    measured 86 GB/s at k=1 — fixed costs scale with payload through the
    tunnel — and unrolled multi-execution jits gave +-10x rep spreads.)"""
    @jax.jit
    def run(stacked):  # tuple of k arrays, each (n_sets, rows, LANES)
        def body(acc, xs):
            return acc + kernel(*xs)[0, 0], None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), stacked, length=n_sets)
        return acc
    return run


def measure(k: int, set_bytes: float, reps: int = 3,
            k_small: int = 8, k_big: int = 40):
    """Aggregate GB/s moving `set_bytes` per kernel execution, split over
    k separate arrays, slope between k_small and k_big chained sets."""
    rows = int(set_bytes / k / (4 * LANES) // BLK_ROWS * BLK_ROWS)
    kernel = _run_once(k, rows)
    run_s = _chained(kernel, k_small)
    run_b = _chained(kernel, k_big)

    def fresh(rep, n_sets):
        ks = jax.random.split(jax.random.PRNGKey(rep), k)
        stacked = tuple(
            jax.random.normal(kk, (n_sets, rows, LANES), jnp.float32)
            for kk in ks)
        jax.block_until_ready(stacked)
        return stacked

    float(run_s(fresh(0, k_small)))   # warm compiles
    float(run_b(fresh(1, k_big)))
    slopes = []
    for rep in range(1, reps + 1):
        a_s = fresh(10 + rep, k_small)
        t0 = time.perf_counter()
        float(run_s(a_s))
        t_s = time.perf_counter() - t0
        del a_s
        a_b = fresh(100 + rep, k_big)
        t0 = time.perf_counter()
        float(run_b(a_b))
        t_b = time.perf_counter() - t0
        del a_b
        d_bytes = 4.0 * LANES * rows * k * (k_big - k_small)
        slopes.append(d_bytes / (t_b - t_s) / 1e9)
    slopes.sort()
    return slopes[len(slopes) // 2], slopes


def main():
    # per-SET working set; k_big = 40 stacked sets live at once, so keep
    # the footprint (40x this) well under the 16GB chip
    total_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 128.0
    print(f"backend={jax.default_backend()} total={total_mb:.0f} MB",
          flush=True)
    for k in (1, 2, 3, 4):
        med, slopes = measure(k, total_mb * 1e6)
        print(f"k={k} buffers: {med:7.1f} GB/s aggregate "
              f"(slopes {[round(s, 1) for s in slopes]})", flush=True)


if __name__ == "__main__":
    main()
