"""Preconditioner families (Lie groups of structured Q with P = Q^T Q)."""
from psgd_tf_tpu.groups import base, dense, diag, kron, lra, shift, splu, xmat

for _name, _mod in [
    ("dense", dense),
    ("diag", diag),
    ("xmat", xmat),
    ("shift", shift),
    ("splu", splu),
    ("lra", lra),
]:
    base.register_flat_family(_name, _mod)

__all__ = ["base", "dense", "diag", "kron", "lra", "shift", "splu", "xmat"]
