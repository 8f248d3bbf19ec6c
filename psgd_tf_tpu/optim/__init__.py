from psgd_tf_tpu.optim.psgd import PSGD, PSGDState, Hyper
from psgd_tf_tpu.optim.uvd import UVd

__all__ = ["PSGD", "PSGDState", "Hyper"]
