from psgd_tf_tpu.ops import linalg

__all__ = ["linalg"]
