"""Seq2seq + attention translation with mixed Kronecker formats.

Reference parity: /root/reference/neural_machine_translation_with_attention.py —
per-layer mixed Kron formats (ref :99-148, reproduced by
`models.nmt.kron_formats`), both exact-Hvp and finite-difference-Hvp train
steps (ref :173-234; FD noted ~1.3x faster, ref :239-240). Data is the
procedural reversal-translation pair (no egress; see data.translation).

This is also the multi-chip flagship: pass `mesh` to shard the batch over
the data axis and replicate params/preconditioner state — see
psgd_tf_tpu.parallel for the sharded training-step builder.
"""
from __future__ import annotations

from functools import partial

import jax

from psgd_tf_tpu import PSGD
from psgd_tf_tpu.data import translation
from psgd_tf_tpu.models import nmt


def run(
    steps: int = 1000,
    batch_size: int = 64,
    max_len: int = 16,
    seed: int = 0,
    exact_hvp: bool = False,
    cfg: nmt.Config = nmt.Config(),
    lr: float = 0.05,
    mesh=None,
) -> dict:
    """`mesh` (a jax.sharding.Mesh with (data, shard) axes, e.g. from
    parallel.make_mesh) runs the whole training step sharded: the batch
    over `data`, preconditioner state per the family policy, fused
    kernels via shard_map."""
    key = jax.random.PRNGKey(seed)
    k_init, k_opt, key = jax.random.split(key, 3)
    params = nmt.init(k_init, cfg)
    opt = PSGD(
        preconditioner="kron",
        kron_formats=nmt.kron_formats(cfg),
        lr_params=lr,
        lr_preconditioner=lr,
        grad_clip_max_norm=1.0,
        exact_hessian_vector_product=exact_hvp,
    )
    state = opt.init(params, k_opt)
    if mesh is not None:
        from psgd_tf_tpu.parallel import build_sharded_step

        step = build_sharded_step(opt, nmt.loss, mesh, state, params, donate=False)
    else:
        step = jax.jit(partial(opt.step, nmt.loss))
    token_acc = jax.jit(nmt.token_accuracy)

    first = None
    loss = None
    for _ in range(steps):
        key, k_data, k_step = jax.random.split(key, 3)
        src, tgt = translation.batch(
            k_data, batch_size, max_len, cfg.vocab_src - translation.SPECIALS
        )
        params, state, aux = step(params, state, k_step, src, tgt)
        if first is None:
            first = float(aux["loss"])
        loss = aux["loss"]

    # held-out evaluation batch: teacher-forced token accuracy. An
    # untrained model scores ~1/vocab (~4%); the measured PSGD trajectory
    # (v5e, lr 0.05, FD Hvp) passes 0.86 at step 800 and 0.93 at step 1000
    # (VALIDATION.md). 0.75 at the default 1000 steps is the discriminating
    # bar — the old "loss halved" criterion couldn't fail (VERDICT r1).
    key, k_eval = jax.random.split(key)
    eval_src, eval_tgt = translation.batch(
        k_eval, 256, max_len, cfg.vocab_src - translation.SPECIALS
    )
    acc = float(token_acc(params, eval_src, eval_tgt))
    return {
        "loss": float(loss),
        "first_loss": first,
        "token_accuracy": acc,
        "success": acc > 0.75,
        "steps": steps,
    }


if __name__ == "__main__":
    print(run())
