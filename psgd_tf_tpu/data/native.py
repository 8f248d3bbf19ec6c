"""ctypes bindings for the native host-side data pipeline.

Builds `_native/batcher.cpp` into a shared library on first use (g++ -O3,
cached next to the source) and exposes it with numpy-buffer signatures.
Everything degrades gracefully: `available()` is False when no compiler or
load failure, and callers (data.mnist / workloads) fall back to the numpy
paths, so the library never hard-requires a toolchain.
"""
from __future__ import annotations

import ctypes
import gzip
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "_native", "batcher.cpp")
_SO = os.path.join(_DIR, "_native", "batcher.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        have_src = os.path.exists(_SRC)
        stale = have_src and (
            not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        )
        if stale and not _build():
            return None
        if not os.path.exists(_SO):  # no binary and no way to build one
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.psgd_decode_idx_images.restype = ctypes.c_long
        lib.psgd_decode_idx_labels.restype = ctypes.c_long
        lib.psgd_sample_batch.restype = None
        lib.psgd_shuffle_epoch.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _read_bytes(path: str) -> bytes:
    if path.endswith(".gz") or not os.path.exists(path) and os.path.exists(path + ".gz"):
        gz = path if path.endswith(".gz") else path + ".gz"
        with gzip.open(gz, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def decode_idx_images(path: str, max_n: int = 1 << 31) -> np.ndarray:
    """(n, rows*cols) float32 in [0,1] from an idx3 file (native decode)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native batcher unavailable")
    raw = np.frombuffer(_read_bytes(path), dtype=np.uint8)
    # validate the header BEFORE sizing any allocation from it
    if raw.size < 16 or int.from_bytes(raw[0:4].tobytes(), "big") != 2051:
        raise ValueError(f"bad idx3 file: {path}")
    n_hdr = int.from_bytes(raw[4:8].tobytes(), "big")
    rows = int.from_bytes(raw[8:12].tobytes(), "big")
    cols = int.from_bytes(raw[12:16].tobytes(), "big")
    n = min(n_hdr, max_n)
    if rows * cols <= 0 or raw.size < 16 + n * rows * cols:
        raise ValueError(f"bad idx3 file: {path}")
    out = np.empty((n, rows * cols), np.float32)
    got = lib.psgd_decode_idx_images(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(raw.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(n),
    )
    if got < 0:
        raise ValueError(f"bad idx3 file: {path}")
    return out[:got]


def decode_idx_labels(path: str, max_n: int = 1 << 31) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native batcher unavailable")
    raw = np.frombuffer(_read_bytes(path), dtype=np.uint8)
    if raw.size < 8 or int.from_bytes(raw[0:4].tobytes(), "big") != 2049:
        raise ValueError(f"bad idx1 file: {path}")
    n = min(int.from_bytes(raw[4:8].tobytes(), "big"), max_n)
    if raw.size < 8 + n:
        raise ValueError(f"bad idx1 file: {path}")
    out = np.empty((n,), np.int32)
    got = lib.psgd_decode_idx_labels(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(raw.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_long(n),
    )
    if got < 0:
        raise ValueError(f"bad idx1 file: {path}")
    return out[:got]


def sample_batch(
    images: np.ndarray, labels: np.ndarray, batch: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Uniformly sample a (batch, feat) x / (batch,) y pair, native gather."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native batcher unavailable")
    assert images.dtype == np.float32 and images.flags.c_contiguous
    assert labels.dtype == np.int32 and labels.flags.c_contiguous
    n, feat = images.shape
    out_x = np.empty((batch, feat), np.float32)
    out_y = np.empty((batch,), np.int32)
    lib.psgd_sample_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_long(n),
        ctypes.c_long(feat),
        ctypes.c_long(batch),
        ctypes.c_uint64(seed),
        out_x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_x, out_y


def shuffle_epoch(n: int, seed: int) -> np.ndarray:
    """Deterministic Fisher-Yates permutation of range(n), native."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native batcher unavailable")
    out = np.empty((n,), np.int64)
    lib.psgd_shuffle_epoch(
        ctypes.c_long(n),
        ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out
