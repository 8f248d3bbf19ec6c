"""Model and data-pipeline tests."""
import jax
import jax.numpy as jnp

from psgd_tf_tpu.data import mnist, translation, xor
from psgd_tf_tpu.models import lenet5, lstm, nmt, rnn, tensor_decomp


def test_xor_batch_semantics():
    x, y = xor.batch(jax.random.PRNGKey(0), 64, 50)
    assert x.shape == (64, 50, 2) and y.shape == (64, 1)
    # channel 0 is ±1, channel 1 has exactly two markers per row
    assert jnp.all(jnp.abs(x[:, :, 0]) == 1.0)
    assert jnp.all(jnp.sum(x[:, :, 1], axis=1) == 2.0)
    assert set(jnp.unique(y).tolist()) <= {-1.0, 1.0}
    # labels actually encode the XOR of the marked bits
    marks = x[:, :, 1] > 0
    for b in range(8):
        i, j = jnp.nonzero(marks[b], size=2)[0]
        expected = -1.0 if x[b, i, 0] == x[b, j, 0] else 1.0
        assert float(y[b, 0]) == expected


def test_mnist_synthetic_learnable_shapes():
    x, y = mnist.synthetic(jax.random.PRNGKey(0), 32)
    assert x.shape == (32, 28, 28, 1)
    assert y.shape == (32,) and y.dtype == jnp.int32
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    # different keys -> different augmentation
    x2, _ = mnist.synthetic(jax.random.PRNGKey(1), 32)
    assert not jnp.allclose(x, x2)


def test_translation_batch_is_reversal_bijection():
    src, tgt = translation.batch(jax.random.PRNGKey(0), 16, 10, content_vocab=29)
    assert src.shape == tgt.shape == (16, 12)
    assert jnp.all(src[:, 0] == translation.BOS)
    for b in range(4):
        s = [t for t in src[b].tolist() if t >= translation.SPECIALS]
        t = [t for t in tgt[b].tolist() if t >= translation.SPECIALS]
        assert len(s) == len(t)
        mapped = [translation.SPECIALS + ((tok - translation.SPECIALS + 7) % 29)
                  for tok in reversed(s)]
        assert t == mapped
        # exactly one EOS each
        assert src[b].tolist().count(translation.EOS) == 1


def test_lenet5_shapes_and_grad():
    params = lenet5.init(jax.random.PRNGKey(0))
    assert [tuple(p.shape) for p in params] == lenet5.LAYER_SHAPES
    x, y = mnist.synthetic(jax.random.PRNGKey(1), 4)
    logits = lenet5.apply(params, x)
    assert logits.shape == (4, 10)
    g = jax.grad(lenet5.loss)(params, x, y)
    assert all(jnp.all(jnp.isfinite(gi)) for gi in g)


def test_lstm_and_rnn_forward():
    x, y = xor.batch(jax.random.PRNGKey(0), 8, 20)
    for mod in (lstm, rnn):
        params = mod.init(jax.random.PRNGKey(1))
        out = mod.apply(params, x)
        assert out.shape == (8, 1)
        assert jnp.isfinite(mod.loss(params, x, y))


def test_nmt_loss_ignores_pad():
    cfg = nmt.Config(vocab_src=16, vocab_tgt=16, embed=8, units=12, attn=4)
    params = nmt.init(jax.random.PRNGKey(0), cfg)
    src, tgt = translation.batch(jax.random.PRNGKey(1), 8, 8, content_vocab=13)
    l1 = nmt.loss(params, src, tgt)
    assert jnp.isfinite(l1)
    # grads flow to every layer
    g = jax.grad(nmt.loss)(params, src, tgt)
    norms = [float(jnp.linalg.norm(gi)) for gi in g]
    assert all(jnp.isfinite(jnp.asarray(norms))) and all(n > 0 for n in norms)


def test_nmt_attention_mask_deviation_is_pinned():
    """We mask PAD in the attention softmax; the reference doesn't
    (ref :126-137). Pin the deviation down (VERDICT r1): EXACT equality on
    unpadded batches, and a measured small relative delta on padded ones
    (encoder states at PAD positions are near-duplicates of the last real
    state, so their softmax mass shifts the context only slightly)."""
    cfg = nmt.Config(vocab_src=16, vocab_tgt=16, embed=8, units=12, attn=4)
    params = nmt.init(jax.random.PRNGKey(0), cfg)

    # unpadded batch: every sequence same length => no PAD in src
    src, tgt = translation.batch(
        jax.random.PRNGKey(1), 8, 6, content_vocab=13, min_len=6
    )
    assert not bool(jnp.any(src == translation.PAD))
    lm = nmt._teacher_forced_logits(params, src, tgt, mask_attention=True)
    lu = nmt._teacher_forced_logits(params, src, tgt, mask_attention=False)
    assert jnp.array_equal(lm, lu)  # bitwise: the mask is a no-op

    # padded batch: quantify the deviation
    src, tgt = translation.batch(jax.random.PRNGKey(2), 8, 10, content_vocab=13)
    assert bool(jnp.any(src == translation.PAD))
    loss_m = float(nmt.loss(params, src, tgt))
    lu = nmt._teacher_forced_logits(params, src, tgt, mask_attention=False)
    real = tgt[:, 1:]
    logp = jax.nn.log_softmax(lu)
    nll = -jnp.take_along_axis(logp, real[..., None], axis=-1)[..., 0]
    mask = (real != translation.PAD).astype(nll.dtype)
    loss_u = float(jnp.mean(nll * mask))
    rel = abs(loss_m - loss_u) / abs(loss_u)
    assert rel < 0.05, f"attention-mask deviation {rel:.3%} exceeds 5%"


def test_tensor_decomp_loss_matches_manual():
    key = jax.random.PRNGKey(0)
    target = tensor_decomp.make_target(key, (4, 5, 6))
    params = tensor_decomp.init(jax.random.fold_in(key, 1), (4, 5, 6), rank=2)
    fit = jnp.zeros((4, 5, 6))
    for r in range(2):
        fit = fit + (
            params["x"][r][:, None, None]
            * params["y"][r][None, :, None]
            * params["z"][r][None, None, :]
        )
    manual = jnp.sum((target - fit) ** 2) + 1e-3 * sum(
        jnp.sum(jnp.abs(p)) for p in params.values()
    )
    assert jnp.allclose(tensor_decomp.loss(params, target), manual, rtol=1e-5)
