"""Per-buffer DMA-stream law measurement (the denominators of bench.py's
`% of k-buf law` columns).

Measures the aggregate HBM bandwidth of a pallas kernel streaming K
SEPARATE input buffers concurrently, for K = 1..4 — the r3 experiment
(/tmp/dma_streams.py, CLAUDE.md) productionized so the law points are
reproducible and the 3-buffer figure is MEASURED rather than interpolated
(ADVICE r4).

Timing method (the third attempt; the first two are cautionary tales):
  * single-execution size-slopes measured 86 GB/s at k=1 — fixed
    per-execution costs scale with payload through this tunnel;
  * unrolled multi-execution jits gave +-10x rep spreads — per-execution
    noise is ~10 ms and the signal was ~15 ms.
  What works is the bench's chained-scan slope with one twist: the
  streamed arrays are LOOP-INVARIANT scan carries (passed through
  unchanged), each 512 MB per buffer — far above VMEM, so re-reading
  them every iteration is a real HBM stream (the CLAUDE.md carry-
  residency trap only bites when the carried working set fits VMEM) —
  and a tiny per-iteration counter row feeds the kernel so consecutive
  calls are not identical (no hoisting/CSE, no request-cache hits).
  Chain lengths adapt to ~0.4 s of device work exactly as bench.py does.

Run on the real chip:  python tools/stream_probe.py [mb_per_buffer]
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from bench import time_chained  # noqa: E402

LANES = 32768          # fp32 row = 128 KB
BLK_ROWS = 32          # 4 MB per-buffer block


def _kernel(*refs, k):
    c_ref, ins, out = refs[0], refs[1:k + 1], refs[k + 1]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    acc = c_ref[0, 0] * 1e-20  # ties the varying counter into the result
    for r in ins:
        acc = acc + jnp.sum(r[:])
    out[:] += acc


def _kernel_copy(*refs, k):
    """k streamed reads AND k streamed writes (out_i = in_i + c) — the
    read+write operating point most routed kernels live at (state in,
    state' out)."""
    c_ref, ins = refs[0], refs[1:k + 1]
    outs = refs[k + 1:]
    c = c_ref[0, 0] * 1e-20
    for r, o in zip(ins, outs):
        o[:] = r[:] + c


def _build(k: int, rows: int, copy: bool = False):
    spec = pl.BlockSpec((BLK_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    crow = pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    if copy:
        out_specs = tuple([spec] * k)
        out_shape = tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
            for _ in range(k))
        # the "inplace" arm is the same copy kernel with the buffers
        # aliased (the r5 aliased state-rewrite operating point: writes
        # land on the DRAM rows just read)
        kern = functools.partial(_kernel_copy, k=k)
        aliases = {i + 1: i for i in range(k)} if copy == "inplace" else {}
    else:
        out_specs = crow
        out_shape = jax.ShapeDtypeStruct((1, 128), jnp.float32)
        kern = functools.partial(_kernel, k=k)
        aliases = {}
    return pl.pallas_call(
        kern,
        grid=(rows // BLK_ROWS,),
        in_specs=[crow] + [spec] * k,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        # k double-buffered 4MB blocks exceed the 16MB default scoped
        # limit at k >= 2 (measured: k=2 overran by 1KB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )


def measure(k: int, buf_bytes: float, copy: bool = False, reps: int = 5):
    """Aggregate GB/s streaming k separate `buf_bytes` arrays per call
    (2k streams counting reads + writes when copy=True)."""
    rows = int(buf_bytes / (4 * LANES) // BLK_ROWS * BLK_ROWS)
    kernel = _build(k, rows, copy=copy)

    def step(carry):
        count, arrays = carry
        c = jnp.full((1, 128), count, jnp.float32)
        out = kernel(c, *arrays)
        if copy == "inplace":
            # the outputs ARE the (donated) carried buffers now
            return count + 1.0 + out[0][0, 0] * 1e-30, tuple(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return count + 1.0 + leaf[0, 0] * 1e-30, arrays

    def make_state(rep: int):
        ks = jax.random.split(jax.random.PRNGKey(rep), k)
        return (jnp.float32(rep), tuple(
            jax.random.normal(kk, (rows, LANES), jnp.float32) for kk in ks))

    dt, spread = time_chained(step, make_state, iters=20, reps=reps)
    mult = 2 if copy else 1
    return mult * 4.0 * LANES * rows * k / dt / 1e9, spread


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 512.0
    print(f"backend={jax.default_backend()} per-buffer {mb:.0f} MB",
          flush=True)
    arms = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "read", "copy", "inplace"]
    modes = {"read": False, "copy": True, "inplace": "inplace"}
    for tag in arms:
        copy = modes[tag]
        for k in (1, 2, 3, 4):
            gbs, spread = measure(k, mb * 1e6, copy=copy)
            print(f"k={k} {tag:8s} buffers: {gbs:7.1f} GB/s aggregate "
                  f"(rel spread {spread['rel_spread']:.1%}, "
                  f"slopes_us {spread['slopes_us']})", flush=True)


if __name__ == "__main__":
    main()
