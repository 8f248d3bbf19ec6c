"""SimpleRNN delayed-XOR with the LRA (UVd) preconditioner.

Reference parity: /root/reference/rnn_xor_UVd_preconditioner.py — rank 10,
init scale 1.0, both lrs 0.01, grad clip 1.0, update probability 1.0, exact
Hvp; success when train loss < 0.1 (ref :37-41, :70-72). The reference also
demonstrates live hyperparameter mutation (switching to FD-Hvp at iteration
1000 via `.assign`, ref :62-69); here `switch_to_fd_at` reproduces that —
the Hvp mode is compile-time static in JAX, so the switch swaps in a second
cached jitted step (one extra compile, no re-init) while traced hypers
(lrs, clip) stay mutable via `PSGD.set_hyper` with no recompile at all.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax

from psgd_tf_tpu import PSGD
from psgd_tf_tpu.data import xor
from psgd_tf_tpu.models import rnn


def run(
    max_iters: int = 100_000,
    seq_len: int = 16,  # ref :8 ("decreasing sequence_length" note)
    batch_size: int = 128,
    hidden: int = 30,
    rank: int = 10,
    seed: int = 0,
    switch_to_fd_at: int | None = None,
    check_every: int = 100,
) -> dict:
    key = jax.random.PRNGKey(seed)
    k_init, k_opt, key = jax.random.split(key, 3)
    params = rnn.init(k_init, hidden=hidden)
    opt = PSGD(
        preconditioner="lra",
        rank=rank,
        init_scale=1.0,
        lr_params=0.01,
        lr_preconditioner=0.01,
        grad_clip_max_norm=1.0,
        exact_hessian_vector_product=True,
    )
    state = opt.init(params, k_opt)
    step = jax.jit(partial(opt.step, rnn.loss))
    step_fd = jax.jit(
        partial(
            dataclasses.replace(opt, exact_hessian_vector_product=False).step,
            rnn.loss,
        )
    )

    loss = None
    for it in range(max_iters):
        key, k_data, k_step = jax.random.split(key, 3)
        x, y = xor.batch(k_data, batch_size, seq_len)
        active = (
            step_fd
            if switch_to_fd_at is not None and it >= switch_to_fd_at
            else step
        )
        params, state, aux = active(params, state, k_step, x, y)
        if (it + 1) % check_every == 0:
            loss = float(aux["loss"])
            if loss < 0.1:  # ref :70-72
                return {"loss": loss, "success": True, "steps": it + 1}
    return {"loss": loss, "success": False, "steps": max_iters}


if __name__ == "__main__":
    print(run())
