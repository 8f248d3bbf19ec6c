"""Hvp probe tests: exact vs dense Hessian oracle, FD vs exact."""
import jax
import jax.numpy as jnp

from psgd_tf_tpu import hvp


def loss_fn(p):
    x = p["x"]
    return jnp.sum(jnp.sin(x) * x**2) + (x @ x) ** 2


def test_exact_matches_dense_hessian():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (6,))
    v = {"x": jax.random.normal(jax.random.fold_in(key, 1), (6,))}
    params = {"x": x}
    loss, grads, hvs = hvp.exact(loss_fn, params, v)
    H = jax.hessian(lambda q: loss_fn({"x": q}))(x)
    assert jnp.allclose(loss, loss_fn(params))
    assert jnp.allclose(grads["x"], jax.grad(lambda q: loss_fn({"x": q}))(x))
    assert jnp.allclose(hvs["x"], H @ v["x"], atol=1e-4)


def test_finite_diff_approximates_exact():
    key = jax.random.PRNGKey(1)
    params = {"x": jax.random.normal(key, (6,))}
    v = {"x": jax.random.normal(jax.random.fold_in(key, 1), (6,))}
    _, _, h_exact = hvp.exact(loss_fn, params, v)
    _, _, h_fd = hvp.finite_diff(loss_fn, params, v)
    rel = jnp.linalg.norm(h_fd["x"] - h_exact["x"]) / jnp.linalg.norm(h_exact["x"])
    assert float(rel) < 0.05


def test_finite_diff_extra_args_and_delta():
    def l2(p, scale):
        return scale * jnp.sum(p["w"] ** 2)

    params = {"w": jnp.arange(4.0)}
    v = {"w": jnp.ones((4,))}
    loss, grads, hvs = hvp.finite_diff(l2, params, v, 2.0, delta=1e-3)
    # Hessian of scale*||w||^2 is 2*scale*I -> Hv = 4*ones
    assert jnp.allclose(hvs["w"], 4.0 * jnp.ones(4), atol=1e-2)
    assert jnp.allclose(grads["w"], 4.0 * params["w"])


def test_random_like_structure_and_scale():
    params = {"a": jnp.zeros((100, 50)), "b": jnp.zeros((1000,))}
    probes = hvp.random_like(jax.random.PRNGKey(0), params)
    assert probes["a"].shape == (100, 50)
    assert probes["b"].shape == (1000,)
    assert abs(float(jnp.std(probes["a"])) - 1.0) < 0.05
    # distinct keys per leaf
    assert not jnp.allclose(probes["a"][:10, 0], probes["b"][:10])
