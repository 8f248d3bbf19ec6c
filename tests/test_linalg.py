import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgd_tf_tpu.ops import linalg


def test_tiny_is_smallest_subnormal_fp32():
    # reference's _tiny (recursive halving) is the smallest subnormal,
    # ~1.4e-45, NOT finfo.tiny (~1.18e-38)
    t = linalg.tiny(jnp.float32)
    assert 0 < t < np.finfo(np.float32).tiny
    assert np.float32(t) > 0
    assert np.float32(t) / 2 == 0


def test_delta_scale_fp32():
    assert np.isclose(linalg.delta_scale(jnp.float32), np.sqrt(np.finfo(np.float32).eps))


def test_solve_ut_roundtrip():
    key = jax.random.PRNGKey(0)
    n = 16
    q = jnp.triu(jax.random.normal(key, (n, n))) + 3.0 * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(1), (n,))
    x = linalg.solve_ut(q, b)
    np.testing.assert_allclose(q @ x, b, rtol=1e-5, atol=1e-5)
    xt = linalg.solve_ut_t(q, b)
    np.testing.assert_allclose(q.T @ xt, b, rtol=1e-5, atol=1e-5)


def test_solve_lt_roundtrip():
    key = jax.random.PRNGKey(2)
    n = 12
    l = jnp.tril(jax.random.normal(key, (n, n))) + 3.0 * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(3), (n,))
    np.testing.assert_allclose(l @ linalg.solve_lt(l, b), b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(l.T @ linalg.solve_lt_t(l, b), b, rtol=1e-5, atol=1e-5)


def test_triu_outer_diff_matmul_matches_naive():
    key = jax.random.PRNGKey(4)
    n = 33
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (n,))
    b = jax.random.normal(k2, (n,))
    q = jax.random.normal(k3, (n, n))
    naive = jnp.triu(jnp.outer(a, a) - jnp.outer(b, b)) @ q
    fast = linalg.triu_outer_diff_matmul(a, b, q)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), rtol=2e-4, atol=2e-4)


def test_triu_outer_diff_maxabs_matches_naive():
    key = jax.random.PRNGKey(5)
    n = 21
    a = jax.random.normal(key, (n,))
    b = jax.random.normal(jax.random.PRNGKey(6), (n,))
    naive = jnp.max(jnp.abs(jnp.triu(jnp.outer(a, a) - jnp.outer(b, b))))
    fast = linalg.triu_outer_diff_maxabs(a, b)
    np.testing.assert_allclose(float(fast), float(naive), rtol=1e-6)


@pytest.mark.parametrize("norm,clip,expected", [(2.0, 1.0, 0.5), (0.5, 1.0, 1.0)])
def test_norm_clip_scale(norm, clip, expected):
    out = linalg.norm_clip_scale(jnp.float32(norm), jnp.float32(clip))
    assert float(out) == pytest.approx(expected)


def test_norm_clip_scale_inf_disables():
    out = linalg.norm_clip_scale(jnp.float32(123.0), jnp.float32(np.inf))
    assert float(out) == 1.0
