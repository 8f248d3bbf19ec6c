"""Synthetic translation task for the seq2seq+attention workload.

The reference NMT demo downloads the spa-eng corpus
(/root/reference/neural_machine_translation_with_attention.py:19-30); with
no egress we use a procedural language pair that still exercises every
model component — embeddings, encoder, additive attention, masked CE:

  source: a random token sequence over vocabulary A (variable length,
          padded with 0), wrapped in <s> ... </s>.
  target: the source *reversed* and mapped through a fixed bijection into
          vocabulary B, also <s> ... </s> padded.

Reversal makes the alignment anti-monotonic, so the decoder must learn a
genuine attention pattern (not just position copying); the bijection forces
the embeddings to carry token identity. Padding + masks mirror the
reference's masked-CE convention (ref :162-167).

Token ids: 0 = PAD, 1 = BOS, 2 = EOS, content tokens are 3..vocab+2.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PAD, BOS, EOS = 0, 1, 2
SPECIALS = 3


def vocab_size(content_vocab: int = 29) -> int:
    return content_vocab + SPECIALS


def batch(
    key: jax.Array,
    batch_size: int = 64,
    max_len: int = 16,
    content_vocab: int = 29,
    min_len: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (src, tgt), each (batch, max_len + 2) int32 with BOS/EOS/PAD.

    `min_len=max_len` yields a PAD-free batch (tests of padding-sensitive
    behavior)."""
    k_len, k_tok = jax.random.split(key)
    lo = max_len // 4 if min_len is None else min_len
    lengths = jax.random.randint(k_len, (batch_size,), lo, max_len + 1)
    toks = jax.random.randint(
        k_tok, (batch_size, max_len), SPECIALS, SPECIALS + content_vocab
    )
    pos = jnp.arange(max_len)[None, :]
    valid = pos < lengths[:, None]
    toks = jnp.where(valid, toks, PAD)

    # target content: reversed valid prefix, bijection = cyclic shift in vocab B
    rev_idx = (lengths[:, None] - 1 - pos) % max_len
    rev = jnp.take_along_axis(toks, rev_idx, axis=1)
    mapped = jnp.where(
        valid, SPECIALS + ((rev - SPECIALS + 7) % content_vocab), PAD
    )

    def _wrap(seq, lens):
        # <s> seq </s> with static shape (batch, max_len + 2)
        out = jnp.concatenate(
            [
                jnp.full((batch_size, 1), BOS, jnp.int32),
                seq,
                jnp.zeros((batch_size, 1), jnp.int32),
            ],
            axis=1,
        )
        eos_pos = lens + 1
        return out.at[jnp.arange(batch_size), eos_pos].set(EOS)

    return _wrap(toks, lengths), _wrap(mapped, lengths)
