"""Rosenbrock banana function — the hello-world workload
(/root/reference/hello_psgd.py:10-12)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init(key: jax.Array | None = None, dtype=jnp.float32):
    """Reference starting point (-1, 1) (ref hello_psgd.py:8)."""
    del key
    return {"x": jnp.asarray(-1.0, dtype), "y": jnp.asarray(1.0, dtype)}


def loss(params) -> jax.Array:
    x, y = params["x"], params["y"]
    return 100.0 * (y - x**2) ** 2 + (1.0 - x) ** 2
