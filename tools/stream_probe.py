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
    out[0, 0] += acc


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
    )


def measure(k: int, total_bytes: float, reps: int = 3):
    """Aggregate GB/s moving `total_bytes` split over k separate arrays."""
    rows_big = int(total_bytes / k / (4 * LANES) // BLK_ROWS * BLK_ROWS)
    rows_small = max(BLK_ROWS, rows_big // 4)
    run_b = jax.jit(_run_once(k, rows_big))
    run_s = jax.jit(_run_once(k, rows_small))

    def fresh(rep, rows):
        ks = jax.random.split(jax.random.PRNGKey(rep), k)
        arrs = [jax.random.normal(kk, (rows, LANES), jnp.float32)
                for kk in ks]
        jax.block_until_ready(arrs)
        return arrs

    float(run_b(*fresh(0, rows_big))[0, 0])   # warm compiles
    float(run_s(*fresh(0, rows_small))[0, 0])
    slopes = []
    for rep in range(1, reps + 1):
        a_s = fresh(rep, rows_small)
        t0 = time.perf_counter()
        float(run_s(*a_s)[0, 0])
        t_s = time.perf_counter() - t0
        a_b = fresh(rep + 100, rows_big)
        t0 = time.perf_counter()
        float(run_b(*a_b)[0, 0])
        t_b = time.perf_counter() - t0
        d_bytes = 4.0 * LANES * (rows_big - rows_small) * k
        slopes.append(d_bytes / (t_b - t_s) / 1e9)
    slopes.sort()
    return slopes[len(slopes) // 2], slopes


def main():
    total_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4096.0
    print(f"backend={jax.default_backend()} total={total_mb:.0f} MB",
          flush=True)
    for k in (1, 2, 3, 4):
        med, slopes = measure(k, total_mb * 1e6)
        print(f"k={k} buffers: {med:7.1f} GB/s aggregate "
              f"(slopes {[round(s, 1) for s in slopes]})", flush=True)


if __name__ == "__main__":
    main()
