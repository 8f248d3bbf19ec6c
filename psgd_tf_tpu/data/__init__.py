"""Data pipelines for the workload suite.

The reference's demos pull MNIST via keras and spa-eng via a download
(/root/reference/mnist_with_lenet5.py:36-41,
/root/reference/neural_machine_translation_with_attention.py:19-30). This
framework runs in hermetic environments, so each pipeline is procedural and
deterministic by default, with a loader for the real on-disk dataset when one
is available (`mnist.load_idx`).
"""
from psgd_tf_tpu.data import mnist, translation, xor

__all__ = ["mnist", "translation", "xor"]
