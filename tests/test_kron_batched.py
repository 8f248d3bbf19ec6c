"""Batched (dense, dense) Kron path: parity vs the per-layer ops.

The batched path (groups/kron.py BatchedDDState) stacks same-bucket layers
padded with exact identity extensions; every result must match the
per-layer path to fp32 tolerance, including through the full optimizer.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgd_tf_tpu import PSGD
from psgd_tf_tpu.groups import kron
from psgd_tf_tpu.ops import linalg
from psgd_tf_tpu.ops.pallas import kron_dd
from psgd_tf_tpu.optim.psgd import KronPrecond

SHAPES = [(26, 6), (121, 84), (85, 10), (100, 128)]


def _probes(key, shapes, salt=0):
    return (
        [jax.random.normal(jax.random.fold_in(key, 2 * i + salt), s) for i, s in enumerate(shapes)],
        [jax.random.normal(jax.random.fold_in(key, 999 + i + salt), s) for i, s in enumerate(shapes)],
    )


def test_update_batched_matches_per_layer():
    key = jax.random.PRNGKey(0)
    bst = kron.init_batched(tuple(SHAPES))
    singles = [kron.init(s, ("dense", "dense")) for s in SHAPES]
    for it in range(4):
        dXs, dGs = _probes(key, SHAPES, salt=it)
        bst = kron.update_batched(bst, dXs, dGs, step=0.1)
        singles = [
            kron.update(s, x, g, step=0.1)
            for s, x, g in zip(singles, dXs, dGs)
        ]
    for u, s, (m, n) in zip(kron.unbatch(bst), singles, SHAPES):
        np.testing.assert_allclose(u.ql, s.ql, atol=2e-5)
        np.testing.assert_allclose(u.qr, s.qr, atol=2e-5)
        # identity padding must stay exact (not merely close)
        S = bst.ql.shape[1]
        pad_rows = np.asarray(bst.ql[0])[SHAPES[0][0]:, :]
        np.testing.assert_array_equal(pad_rows, np.eye(S)[SHAPES[0][0]:, :])


def test_apply_batched_matches_per_layer():
    key = jax.random.PRNGKey(1)
    bst = kron.init_batched(tuple(SHAPES))
    dXs, dGs = _probes(key, SHAPES)
    bst = kron.update_batched(bst, dXs, dGs, step=0.2)
    singles = kron.unbatch(bst)
    pre_b = kron.apply_batched(bst, dGs)
    for p, s, g in zip(pre_b, singles, dGs):
        np.testing.assert_allclose(p, kron.apply(s, g), atol=2e-4)


def test_gridded_pallas_matches_vmap_xla():
    key = jax.random.PRNGKey(2)
    bst = kron.init_batched(tuple(SHAPES))
    dXs, dGs = _probes(key, SHAPES)
    S, T = bst.ql.shape[1], bst.qr.shape[1]
    dx = kron.stack_padded(dXs, S, T)
    dg = kron.stack_padded(dGs, S, T)
    ms = jnp.asarray([m for m, _ in SHAPES], jnp.int32)
    ns = jnp.asarray([n for _, n in SHAPES], jnp.int32)
    t = linalg.tiny(jnp.float32)
    ql_p, qr_p = kron_dd.fused_update_batched(
        bst.ql, bst.qr, dx, dg, ms, ns, 0.1, t, interpret=True
    )
    ql_x, qr_x = jax.vmap(
        kron._update_dd_padded, in_axes=(0, 0, 0, 0, 0, 0, None, None)
    )(bst.ql, bst.qr, dx, dg, ms, ns, jnp.float32(0.1), t)
    np.testing.assert_allclose(ql_p, ql_x, atol=1e-5)
    np.testing.assert_allclose(qr_p, qr_x, atol=1e-5)


@pytest.mark.parametrize("formats", [
    [("dense", "dense")] * 4,
    [("scale", "dense")] + [("dense", "dense")] * 3,
])
def test_optimizer_batched_trajectory_matches_unbatched(formats):
    key = jax.random.PRNGKey(3)
    params = [
        0.1 * jax.random.normal(jax.random.fold_in(key, i), s)
        for i, s in enumerate(SHAPES)
    ]

    def loss(p):
        return sum(jnp.sum(w * w) * 0.5 + jnp.sum(jnp.sin(w)) for w in p)

    def run(batched):
        opt = PSGD(
            preconditioner="kron", kron_formats=formats,
            lr_params=0.05, lr_preconditioner=0.1,
            kron_batched=batched, kron_batch_min=2,
        )
        state = opt.init(params, key)
        if batched:
            assert isinstance(state.precond, KronPrecond)
        p = params
        k = jax.random.PRNGKey(7)
        step = jax.jit(lambda p, s, k: opt.step(loss, p, s, k))
        for _ in range(10):
            k, sub = jax.random.split(k)
            p, state, aux = step(p, state, sub)
        return p, aux["loss"]

    pb, lb = run(True)
    pu, lu = run(False)
    for a, b in zip(pb, pu):
        np.testing.assert_allclose(a, b, atol=5e-5)
    np.testing.assert_allclose(lb, lu, rtol=1e-5)


def test_bucket_threshold_respected():
    params = [jnp.ones(s) for s in [(20, 6), (30, 8)]]
    opt = PSGD(preconditioner="kron", kron_formats=[("dense", "dense")] * 2,
               kron_batch_min=4)
    state = opt.init(params, jax.random.PRNGKey(0))
    # bucket of 2 < kron_batch_min=4: falls back to the plain list path
    assert isinstance(state.precond, list)
