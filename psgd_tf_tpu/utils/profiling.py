"""Profiling helpers: named scopes on the hot phases + XProf trace capture.

The reference's only instrumentation is print statements and one wall-clock
comment (SURVEY.md §5). Here: `jax.named_scope` labels the preconditioner
phases so XProf/TensorBoard traces attribute device time to
hvp / q_update / q_apply, and `trace` wraps a code region into a trace dump
viewable with `xprof` or TensorBoard's profile plugin.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

# Re-export: library code uses psgd_tf_tpu.utils.profiling.scope so the
# annotation layer has one owner (swap-out point for torch-style NVTX if
# anyone ports the host runtime).
scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA device trace of the enclosed region into `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(label: str, sink=print) -> Iterator[None]:
    """Host wall-clock of a region (blocks on nothing itself; pair with
    jax.block_until_ready around the region for honest device timing)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"{label}: {time.perf_counter() - t0:.4f}s")
