"""Native (C++) data-pipeline tests: build, idx decode, batch sampling."""
import struct

import numpy as np
import pytest

from psgd_tf_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native build failed"
)


def _write_idx(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(50, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, size=(50,), dtype=np.uint8)
    ipath = tmp_path / "imgs"
    with open(ipath, "wb") as f:
        f.write(struct.pack(">IIII", 2051, 50, 28, 28))
        f.write(imgs.tobytes())
    lpath = tmp_path / "labels"
    with open(lpath, "wb") as f:
        f.write(struct.pack(">II", 2049, 50))
        f.write(labels.tobytes())
    return str(ipath), str(lpath), imgs, labels


def test_idx_decode_matches_numpy(tmp_path):
    ipath, lpath, imgs, labels = _write_idx(tmp_path)
    x = native.decode_idx_images(ipath)
    y = native.decode_idx_labels(lpath)
    np.testing.assert_allclose(
        x, imgs.reshape(50, -1).astype(np.float32) / 255.0, atol=1e-7
    )
    np.testing.assert_array_equal(y, labels.astype(np.int32))


def test_idx_decode_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad"
    p.write_bytes(struct.pack(">IIII", 1234, 1, 2, 2) + b"\x00" * 4)
    with pytest.raises(ValueError, match="bad idx3"):
        native.decode_idx_images(str(p))


def test_sample_batch_deterministic_and_valid():
    rng = np.random.default_rng(1)
    images = rng.random((100, 17), dtype=np.float32)
    labels = rng.integers(0, 10, size=(100,)).astype(np.int32)
    x1, y1 = native.sample_batch(images, labels, 32, seed=42)
    x2, y2 = native.sample_batch(images, labels, 32, seed=42)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    x3, _ = native.sample_batch(images, labels, 32, seed=43)
    assert not np.array_equal(x1, x3)
    # every sampled row is an actual dataset row with its own label
    for row, lab in zip(x1, y1):
        idx = np.where((images == row).all(axis=1))[0]
        assert len(idx) >= 1 and lab in labels[idx]


def test_shuffle_epoch_is_permutation():
    order = native.shuffle_epoch(1000, seed=7)
    assert sorted(order.tolist()) == list(range(1000))
    order2 = native.shuffle_epoch(1000, seed=7)
    np.testing.assert_array_equal(order, order2)
    assert not np.array_equal(order, np.arange(1000))
