"""Tensor-decomposition workload across every preconditioner family.

Reference parity: /root/reference/demo_usage_of_all_preconditioners.py —
rank-5 CP decomposition of a random 10x20x50 tensor with L1 penalty, 100
iterations, step 0.1 for both lrs. The reference offers dense / sparse-LU /
kron selected by editing a string (ref :22-24); here the family is an
argument and the suite additionally runs the families the reference only
documents (diag, xmat, lra — README.md:13-15) plus the butterfly/shift
family no release implements (README.md:15, groups/shift.py).
"""
from __future__ import annotations

from functools import partial

import jax

from psgd_tf_tpu import PSGD
from psgd_tf_tpu.models import tensor_decomp

FAMILIES = ("dense", "diag", "xmat", "shift", "splu", "lra", "kron")


def run(
    preconditioner: str = "dense",
    steps: int = 100,
    seed: int = 0,
    rank: int = 10,
    lr: float = 0.1,
) -> dict:
    key = jax.random.PRNGKey(seed)
    k_target, k_init, k_opt, key = jax.random.split(key, 4)
    target = tensor_decomp.make_target(k_target)
    params = tensor_decomp.init(k_init)
    opt = PSGD(
        preconditioner=preconditioner,
        rank=rank,
        init_scale=0.1,  # the reference scales every initial Q by 0.1
        #                # (ref :28, :48-52, :72-75)
        lr_params=lr,
        lr_preconditioner=lr,
    )
    state = opt.init(params, k_opt)
    step = jax.jit(partial(opt.step, tensor_decomp.loss))
    first = None
    loss = None
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, state, aux = step(params, state, sub, target)
        if first is None:
            first = float(aux["loss"])
        loss = aux["loss"]
    final = float(loss)
    # success = the decomposition fit improved by >10x over the run
    return {
        "loss": final,
        "first_loss": first,
        "success": final < 0.1 * first,
        "steps": steps,
    }


def run_all(steps: int = 100, seed: int = 0) -> dict:
    return {fam: run(fam, steps=steps, seed=seed) for fam in FAMILIES}


if __name__ == "__main__":
    for fam, result in run_all().items():
        print(fam, result)
