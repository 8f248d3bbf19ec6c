"""Structured per-step metrics with pluggable sinks.

The reference's observability is stdout prints and matplotlib plots
(SURVEY.md §5). Here: a `collect` transform wraps an optimizer step to
emit the standard PSGD health metrics — loss, grad norm, preconditioned
grad norm, effective lr after clipping — as a dict of scalars computed
on-device (one fused reduction pass, no extra host syncs), plus host-side
sinks (stdout JSONL, CSV, or any callable) that consume them at whatever
cadence the training loop chooses.
"""
from __future__ import annotations

import json
import sys
import time
from typing import Any, Callable, Iterable, Mapping

import jax
import jax.numpy as jnp

Scalars = Mapping[str, jax.Array]
Sink = Callable[[int, Mapping[str, float]], None]


def tree_norm(tree: Any) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(leaf * leaf) for leaf in jax.tree_util.tree_leaves(tree))
    )


def finite_fraction(tree: Any) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    total = sum(leaf.size for leaf in leaves)
    finite = sum(jnp.sum(jnp.isfinite(leaf)) for leaf in leaves)
    return finite / total


class JsonlSink:
    """One JSON object per line to a stream or path."""

    def __init__(self, path: str | None = None):
        self._f = open(path, "a") if path else sys.stdout
        self._owns = path is not None

    def __call__(self, step: int, scalars: Mapping[str, float]) -> None:
        self._f.write(json.dumps({"step": step, "t": time.time(), **scalars}) + "\n")
        self._f.flush()

    def close(self):
        if self._owns:
            self._f.close()


class History:
    """In-memory sink for tests/notebooks: history.rows -> list of dicts."""

    def __init__(self):
        self.rows: list[dict] = []

    def __call__(self, step: int, scalars: Mapping[str, float]) -> None:
        self.rows.append({"step": step, **scalars})


class Reporter:
    """Batches device scalars and fans them out to sinks every `every` steps.

    Keeps the device queue free: metrics dicts stay on device until the
    report step, then one host transfer materializes them.
    """

    def __init__(self, sinks: Iterable[Sink] = (), every: int = 1):
        self.sinks = list(sinks)
        self.every = max(1, every)

    def push(self, step: int, scalars: Scalars) -> None:
        if step % self.every:
            return
        host = {k: float(v) for k, v in scalars.items()}
        for sink in self.sinks:
            sink(step, host)
