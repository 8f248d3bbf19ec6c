"""Workload models, matching the reference demo suite (SURVEY.md §2.2).

Every model is a pure-functional pair `init(key) -> params` /
`loss(params, *batch) -> scalar`, with parameters stored as the reference's
PSGD-consumable matrices — each weight is an (in_features + 1, out_features)
matrix whose last row is the bias (e.g.
/root/reference/mnist_with_lenet5.py:12-16) — so Kronecker preconditioners
act on whole layers including their biases.
"""
from psgd_tf_tpu.models import lenet5, lstm, nmt, rnn, rosenbrock, tensor_decomp

__all__ = ["lenet5", "lstm", "nmt", "rnn", "rosenbrock", "tensor_decomp"]
