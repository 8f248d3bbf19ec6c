"""Vanilla (simple) RNN for delayed-XOR with the LRA/UVd optimizer.

Reference parity: /root/reference/rnn_xor_UVd_preconditioner.py:28-34 — a
keras SimpleRNN(30) + Dense(1), kernels shrunk to 1/3 of glorot-uniform.
Here the same network in PSGD matrix form: W_rnn is
(dim_in + hidden + 1, hidden) with tanh, W_fc is (hidden + 1, out).

TPU-native: `lax.scan` time loop, fused input+recurrent matmul.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def init(key: jax.Array, dim_in: int = 2, hidden: int = 30, dim_out: int = 1, dtype=jnp.float32):
    """Glorot-uniform / 3 (the reference shrinks keras defaults, ref :33-34)."""
    k1, k2 = jax.random.split(key)

    def glorot3(k, fan_in, fan_out):
        lim = (6.0 / (fan_in + fan_out)) ** 0.5 / 3.0
        w = jax.random.uniform(k, (fan_in, fan_out), dtype, -lim, lim)
        return jnp.concatenate([w, jnp.zeros((1, fan_out), dtype)], axis=0)

    return [glorot3(k1, dim_in + hidden, hidden), glorot3(k2, hidden, dim_out)]


def apply(params, x: jax.Array) -> jax.Array:
    """x: (batch, T, dim_in) -> logits (batch, dim_out)."""
    w_rnn, w_fc = params
    hidden = w_fc.shape[0] - 1
    h0 = jnp.zeros((x.shape[0], hidden), x.dtype)

    def cell(h, xt):
        h = jnp.tanh(jnp.concatenate([xt, h], axis=1) @ w_rnn[:-1] + w_rnn[-1])
        return h, None

    h, _ = lax.scan(cell, h0, jnp.swapaxes(x, 0, 1))
    return h @ w_fc[:-1] + w_fc[-1]


def loss(params, x: jax.Array, y: jax.Array) -> jax.Array:
    """Logistic loss, y in {-1, +1} (ref :44-45)."""
    return jnp.mean(jnp.log1p(jnp.exp(-y * apply(params, x))))
