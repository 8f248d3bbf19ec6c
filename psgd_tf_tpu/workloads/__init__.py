"""Runnable workloads reproducing the reference demo suite (SURVEY.md §2.2).

Each module exposes `run(**overrides) -> dict` returning at least
`{"loss": float, "success": bool, "steps": int}` with the reference's own
success criterion (e.g. delayed-XOR train loss < 0.1,
/root/reference/lstm_with_xor_problem.py:72-74). They double as the
integration-test layer and as CLI demos:

    python -m psgd_tf_tpu.workloads.hello_psgd
"""
from psgd_tf_tpu.workloads import (
    all_preconditioners,
    hello_psgd,
    lstm_xor,
    mnist_lenet5,
    nmt_attention,
    rnn_xor_lra,
)

__all__ = [
    "all_preconditioners",
    "hello_psgd",
    "lstm_xor",
    "mnist_lenet5",
    "nmt_attention",
    "rnn_xor_lra",
]
