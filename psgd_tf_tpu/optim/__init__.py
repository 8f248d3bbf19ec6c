from psgd_tf_tpu.optim.psgd import PSGD, PSGDState, Hyper

__all__ = ["PSGD", "PSGDState", "Hyper"]
