"""Aux-subsystem tests: checkpoint round-trip, metrics, finite checks."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import psgd_tf_tpu as psgd
from psgd_tf_tpu.models import rosenbrock
from psgd_tf_tpu.utils import checkpoint, checks, metrics


def _trained_state(steps=5):
    opt = psgd.PSGD(preconditioner="lra", rank=2, init_scale=0.1,
                    lr_params=0.01, lr_preconditioner=0.1)
    params = rosenbrock.init()
    state = opt.init(params, jax.random.PRNGKey(0))
    step = jax.jit(partial(opt.step, rosenbrock.loss))
    key = jax.random.PRNGKey(1)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, state, _ = step(params, state, sub)
    return opt, params, state, key


def test_checkpoint_roundtrip(tmp_path):
    opt, params, state, key = _trained_state()
    train_state = {"params": params, "opt": state, "key": key}
    checkpoint.save(str(tmp_path), 5, train_state)
    assert checkpoint.latest_step(str(tmp_path)) == 5

    fresh = {
        "params": rosenbrock.init(),
        "opt": opt.init(rosenbrock.init(), jax.random.PRNGKey(0)),
        "key": jax.random.PRNGKey(0),
    }
    restored = checkpoint.restore(str(tmp_path), like=fresh)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(train_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored Q factors resume the trajectory exactly
    step = jax.jit(partial(opt.step, rosenbrock.loss))
    k = jax.random.PRNGKey(9)
    _, _, aux_orig = step(params, state, k)
    _, _, aux_rest = step(restored["params"], restored["opt"], k)
    assert float(aux_orig["loss"]) == float(aux_rest["loss"])


def test_checkpoint_latest_of_many(tmp_path):
    _, params, state, key = _trained_state(2)
    for s in (1, 3, 10):
        checkpoint.save(str(tmp_path), s, {"params": params})
    assert checkpoint.latest_step(str(tmp_path)) == 10


def test_finite_checks():
    good = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
    bad = {"a": jnp.ones(3), "b": jnp.array([[1.0, jnp.nan], [jnp.inf, 0.0]])}
    assert bool(checks.all_finite(good))
    assert not bool(checks.all_finite(bad))
    assert checks.first_nonfinite(good) == []
    assert checks.first_nonfinite(bad) == ["['b']"]


def test_metrics_reporter_and_history():
    hist = metrics.History()
    rep = metrics.Reporter([hist], every=2)
    for step in range(6):
        rep.push(step, {"loss": jnp.asarray(float(step))})
    assert [r["step"] for r in hist.rows] == [0, 2, 4]
    assert hist.rows[-1]["loss"] == 4.0


def test_step_aux_contains_health_metrics():
    opt = psgd.PSGD(preconditioner="diag", lr_params=0.1)
    params = rosenbrock.init()
    state = opt.init(params, jax.random.PRNGKey(0))
    _, _, aux = jax.jit(partial(opt.step, rosenbrock.loss))(
        params, state, jax.random.PRNGKey(1)
    )
    for k in ("loss", "grad_norm", "pre_grad_norm", "lr_effective"):
        assert k in aux and jnp.isfinite(aux[k])
