"""Golden-trajectory tests (SURVEY.md §4b).

Independent float64 numpy oracles implement the reference's update
equations (from the math contracts in SURVEY.md §0/§2.1 — dense C2,
kron (dense,dense) C6, UVd C17), and multi-step trajectories with
*injected* probe sequences are compared against the fp32 JAX
implementation. Injecting (v, h) and replicating the PRNG branch decisions
factors TF-vs-JAX RNG divergence out of the comparison, per the survey's
test strategy.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgd_tf_tpu.groups import dense, kron, lra
from psgd_tf_tpu.ops import linalg

TINY64 = float(np.nextafter(np.float32(0), np.float32(1)))  # fp32 subnormal
STEPS = 20
N = 24


# ---------------------------------------------------------------- oracles

def dense_oracle(Q, v, h, step):
    """C2: a = Q h; b = Q^-T v; Q <- Q - step/(max|triu(aa'-bb')|+tiny) triu(..) Q."""
    a = Q @ h
    b = np.linalg.solve(Q.T, v)
    grad = np.triu(np.outer(a, a) - np.outer(b, b))
    step0 = step / (np.abs(grad).max() + TINY64)
    return Q - step0 * (grad @ Q)


def kron_dd_oracle(Ql, Qr, dX, dG, step):
    """C6: balance by rho; A = Ql dG Qr'; Bt = Ql^-T dX Qr^-1; two triu grads."""
    rho = np.sqrt(np.diagonal(Ql).max() / np.diagonal(Qr).max())
    Ql, Qr = Ql / rho, rho * Qr
    A = Ql @ dG @ Qr.T
    Bt = np.linalg.solve(Ql.T, dX) @ np.linalg.inv(Qr)
    g1 = np.triu(A @ A.T - Bt @ Bt.T)
    g2 = np.triu(A.T @ A - Bt.T @ Bt)
    s1 = step / (np.abs(g1).max() + TINY64)
    s2 = step / (np.abs(g2).max() + TINY64)
    return Ql - s1 * (g1 @ Ql), Qr - s2 * (g2 @ Qr)


def lra_oracle(U, V, d, v, h, step, *, balance, update_u):
    """C17: optional rebalance; Woodbury P^-1 v; diag grad; U-or-V update."""
    if balance:
        rho = np.sqrt(np.abs(U).max() / np.abs(V).max())
        U, V = U / rho, rho * V

    Qh = d * h + U @ (V.T @ (d * h))
    Ph = d * (Qh + V @ (U.T @ Qh))
    IpVtU = np.eye(U.shape[1]) + V.T @ U
    invQtv = v / d
    invQtv = invQtv - V @ np.linalg.solve(IpVtU.T, U.T @ invQtv)
    invPv = (invQtv - U @ np.linalg.solve(IpVtU, V.T @ invQtv)) / d

    nablaD = Ph * h - v * invPv
    mu = step / (np.abs(nablaD).max() + TINY64)
    new_d = d - mu * d * nablaD

    a, b = Qh, invQtv
    if update_u:
        atV = a @ V
        btV = b @ V
        atVVt = V @ atV
        btVVt = V @ btV
        norm = np.sqrt(
            np.abs(
                (a @ a) * (atVVt @ atVVt)
                + (b @ b) * (btVVt @ btVVt)
                - 2.0 * (a @ b) * (atVVt @ btVVt)
            )
        )
        mu = step / (norm + TINY64)
        U = U - mu * (np.outer(a, atV @ IpVtU) - np.outer(b, btV @ IpVtU))
    else:
        atU = a @ U
        btU = b @ U
        norm = np.sqrt(
            np.abs(
                ((U @ atU) @ (U @ atU)) * (a @ a)
                + ((U @ btU) @ (U @ btU)) * (b @ b)
                - 2.0 * ((U @ atU) @ (U @ btU)) * (a @ b)
            )
        )
        mu = step / (norm + TINY64)
        V = V - mu * (np.outer(a + V @ atU, atU) - np.outer(b + V @ btU, btU))
    return U, V, new_d


# ------------------------------------------------------------ trajectories

def _probes(seed, steps=STEPS, n=N):
    rng = np.random.default_rng(seed)
    return [
        (rng.standard_normal(n), rng.standard_normal(n)) for _ in range(steps)
    ]


def test_dense_trajectory_matches_oracle():
    state = dense.init(N, init_scale=0.5)
    Q64 = np.asarray(state.Q, np.float64)
    upd = jax.jit(partial(dense.update, step=0.05))
    for v, h in _probes(0):
        state = upd(state, jnp.asarray(v, jnp.float32), jnp.asarray(h, jnp.float32))
        Q64 = dense_oracle(Q64, v, h, 0.05)
    rel = np.abs(np.asarray(state.Q) - Q64).max() / np.abs(Q64).max()
    assert rel < 5e-4, rel


def test_kron_dd_trajectory_matches_oracle():
    m, n = 12, 8
    state = kron.init((m, n), fmt=("dense", "dense"), init_scale=0.7)
    Ql64 = np.asarray(state.ql, np.float64)
    Qr64 = np.asarray(state.qr, np.float64)
    rng = np.random.default_rng(1)
    upd = jax.jit(partial(kron.update, step=0.05))
    for _ in range(STEPS):
        dX = rng.standard_normal((m, n))
        dG = rng.standard_normal((m, n))
        state = upd(state, jnp.asarray(dX, jnp.float32), jnp.asarray(dG, jnp.float32))
        Ql64, Qr64 = kron_dd_oracle(Ql64, Qr64, dX, dG, 0.05)
    for got, want in ((state.ql, Ql64), (state.qr, Qr64)):
        rel = np.abs(np.asarray(got) - want).max() / np.abs(want).max()
        assert rel < 5e-4, rel


def test_lra_trajectory_matches_oracle():
    key = jax.random.PRNGKey(7)
    state = lra.init(key, N, rank=4)
    # oracle keeps the reference's (n, r) column layout; the implementation
    # stores rank-major (r, n) — transpose at the boundary
    U64 = np.asarray(state.U, np.float64).T
    V64 = np.asarray(state.V, np.float64).T
    d64 = np.asarray(state.d, np.float64)
    upd = jax.jit(partial(lra.update, step=0.05))
    step_key = jax.random.PRNGKey(11)
    for v, h in _probes(2):
        step_key, k = jax.random.split(step_key)
        # replicate the implementation's branch decisions (lra.update
        # splits k into (k_bal, k_uv) and draws uniforms)
        k_bal, k_uv = jax.random.split(k)
        balance = bool(jax.random.uniform(k_bal, dtype=jnp.float32) < 0.01)
        update_u = bool(jax.random.uniform(k_uv, dtype=jnp.float32) < 0.5)
        state = upd(
            state, jnp.asarray(v, jnp.float32), jnp.asarray(h, jnp.float32), key=k
        )
        U64, V64, d64 = lra_oracle(
            U64, V64, d64, v, h, 0.05, balance=balance, update_u=update_u
        )
    for got, want in ((state.U.T, U64), (state.V.T, V64), (state.d, d64)):
        rel = np.abs(np.asarray(got) - want).max() / np.abs(want).max()
        assert rel < 1e-3, rel


def test_dense_oracle_criterion_sanity():
    """The oracle itself must decrease the PSGD fitting criterion — guards
    against an oracle bug silently matching an implementation bug."""
    rng = np.random.default_rng(3)
    H = rng.standard_normal((N, N))
    H = H @ H.T / N + 0.5 * np.eye(N)
    Q = 0.3 * np.eye(N)

    def crit(Q):
        # E over fixed probe set of |Q h|^2 + |Q^-T v|^2
        tot = 0.0
        for v, _ in _probes(4, steps=8):
            h = H @ v
            b = np.linalg.solve(Q.T, v)
            tot += (Q @ h) @ (Q @ h) + b @ b
        return tot

    before = crit(Q)
    for v, _ in _probes(5, steps=40):
        Q = dense_oracle(Q, v, H @ v, 0.1)
    assert crit(Q) < before
