"""The stateful closure-style UVd class (reference parity ref :630-764)."""
import jax
import jax.numpy as jnp
import numpy as np

from psgd_tf_tpu import PSGD, UVd


def _quad_closure(A, b):
    def closure(params):
        r = A @ params["x"] - b
        return 0.5 * jnp.sum(r * r)
    return closure


def _setup(key):
    k1, k2, k3 = jax.random.split(key, 3)
    A = jax.random.normal(k1, (8, 8)) / 8 ** 0.5 + jnp.eye(8)
    b = jax.random.normal(k2, (8,))
    params = {"x": jax.random.normal(k3, (8,))}
    return A, b, params


def test_step_converges_and_returns_closure_value():
    A, b, params = _setup(jax.random.PRNGKey(0))
    opt = UVd(params, rank_of_modification=4, lr_params=0.2,
              lr_preconditioner=0.2, key=jax.random.PRNGKey(1))
    closure = _quad_closure(A, b)
    first = float(opt.step(closure))
    for _ in range(150):
        loss = opt.step(closure)
    assert float(loss) < 1e-3 * max(first, 1.0)
    # step returns the closure's value at the PRE-step params (ref :764)
    assert float(closure(opt.params)) <= float(loss)


def test_closure_tuple_returns_pass_through():
    A, b, params = _setup(jax.random.PRNGKey(2))
    def closure(p):
        r = A @ p["x"] - b
        loss = 0.5 * jnp.sum(r * r)
        return loss, r  # iterable: first element is the loss (ref :645)
    opt = UVd(params, rank_of_modification=3, key=jax.random.PRNGKey(3))
    loss, resid = opt.step(closure)
    assert resid.shape == (8,)


def test_live_hyper_mutation_no_recompile():
    A, b, params = _setup(jax.random.PRNGKey(4))
    opt = UVd(params, rank_of_modification=3, lr_params=0.1,
              key=jax.random.PRNGKey(5))
    closure = _quad_closure(A, b)
    opt.step(closure)
    n_compiled = len(opt._jitted)
    opt.lr_params = 0.02               # plain `=`, unlike the reference's
    opt.grad_clip_max_norm = 1.0       # .assign requirement (ref :660-663)
    opt.step(closure)
    assert len(opt._jitted) == n_compiled  # traced scalars: no new compile
    assert float(opt.lr_params) == np.float32(0.02)


def test_exact_to_fd_switch_mid_run():
    # the reference demos flipping to FD-Hvp at iter 1000 via .assign
    # (rnn_xor_UVd_preconditioner.py:62-69); here it is a property write
    A, b, params = _setup(jax.random.PRNGKey(6))
    opt = UVd(params, rank_of_modification=3, lr_params=0.2,
              lr_preconditioner=0.2, key=jax.random.PRNGKey(7))
    closure = _quad_closure(A, b)
    for _ in range(20):
        opt.step(closure)
    opt.exact_hessian_vector_product = False
    for _ in range(100):
        loss = opt.step(closure)
    assert float(loss) < 1e-2


def test_update_probability_switch_mid_run():
    # ref :679,:703: update_probability is .assign-able any time. The class
    # wrapper re-enables the compiled-out coin branch transparently.
    A, b, params = _setup(jax.random.PRNGKey(10))
    opt = UVd(params, rank_of_modification=3, key=jax.random.PRNGKey(11))
    closure = _quad_closure(A, b)
    opt.step(closure)
    U_before = opt.state.precond.U
    opt.preconditioner_update_probability = 1e-9  # freeze Q from here on
    for _ in range(5):
        opt.step(closure)
    assert jnp.array_equal(opt.state.precond.U, U_before)
    opt.preconditioner_update_probability = 0.9  # live again, no rebuild
    for _ in range(20):
        opt.step(closure)
    assert not jnp.array_equal(opt.state.precond.U, U_before)


def test_jit_cache_never_aliases_dead_closure_ids():
    # Regression (round-3 verdict): the jit cache used to key on
    # id(closure) alone. CPython reuses addresses after GC, so a fresh
    # closure at a dead closure's id would silently run the OLD compiled
    # program. The cache now pins each closure strongly (id reuse becomes
    # impossible while the entry lives) and identity-checks on hit.
    A, b, params = _setup(jax.random.PRNGKey(12))
    opt = UVd(params, rank_of_modification=3, key=jax.random.PRNGKey(13))

    def make(scale):
        def closure(p):
            r = A @ p["x"] - b
            return scale * jnp.sum(r * r)
        return closure

    c1 = make(1.0)
    loss1 = float(opt.step(c1))
    # the cache must hold c1 strongly: its id can never be recycled
    assert any(entry[0] is c1 for entry in opt._jitted.values())
    c1_id = id(c1)
    del c1
    # allocate many closures; even if one lands on c1's old address the
    # pinned entry keeps the id live in CPython, so this can't collide —
    # and the identity check would reject it regardless
    for _ in range(64):
        c2 = make(100.0)
        if id(c2) == c1_id:
            break
    loss2 = float(opt.step(c2))
    # c2's semantics (100x loss) must be what actually executed
    assert loss2 > 10.0 * loss1


def test_matches_functional_psgd_trajectory():
    # same coins + same probes => the class wrapper IS the functional
    # optimizer; verify the wrapper adds no drift
    A, b, params = _setup(jax.random.PRNGKey(8))
    key = jax.random.PRNGKey(9)
    opt_c = UVd(params, rank_of_modification=4, lr_params=0.1,
                lr_preconditioner=0.1, key=key)
    closure = _quad_closure(A, b)

    opt_f = PSGD(preconditioner="lra", rank=4, lr_params=0.1,
                 lr_preconditioner=0.1)
    k = key
    k, init_key = jax.random.split(k)
    state = opt_f.init(params, init_key)
    p = params
    step = jax.jit(lambda p, s, kk: opt_f.step(lambda q: closure(q), p, s, kk))
    for _ in range(10):
        opt_c.step(closure)
        k, sub = jax.random.split(k)
        p, state, _ = step(p, state, sub)
    np.testing.assert_allclose(opt_c.params["x"], p["x"], atol=1e-6)
