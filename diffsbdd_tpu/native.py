"""ctypes bindings for the native host-runtime kernels (native/host_ops.cpp).

Loads ``libdiffsbdd_host.so`` if present (``make -C native``), otherwise
every entry point reports unavailable and callers fall back to the numpy
implementations — the framework works either way; the native kernels speed
up the host-side hot loops (batch collate, evaluation-time bond perception).
"""
from __future__ import annotations

import ctypes
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent.parent / "native" / \
    "libdiffsbdd_host.so"
_lib = None


def _load():
    global _lib
    if _lib is None and _LIB_PATH.exists():
        lib = ctypes.CDLL(str(_LIB_PATH))
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.pad_collate.restype = ctypes.c_int
        lib.pad_collate.argtypes = [
            f32p, f32p, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, f32p, f32p, f32p, i32p]
        lib.pad_collate_gather.restype = ctypes.c_int
        lib.pad_collate_gather.argtypes = [
            f32p, f32p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, f32p, f32p, f32p, i32p]
        lib.perceive_bonds.restype = ctypes.c_int
        lib.perceive_bonds.argtypes = [
            f32p, i32p, ctypes.c_int64, f64p, f64p, f64p, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, i32p,
            ctypes.c_int64]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pad_collate(coords: np.ndarray, one_hot: np.ndarray,
                offsets: np.ndarray, n_max: int):
    """Native padded collate; returns (x, one_hot, mask, size) or None."""
    lib = _load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.float32)
    one_hot = np.ascontiguousarray(one_hot, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    batch = len(offsets) - 1
    nf = one_hot.shape[1]
    out_x = np.empty((batch, n_max, 3), np.float32)
    out_oh = np.empty((batch, n_max, nf), np.float32)
    out_mask = np.empty((batch, n_max), np.float32)
    out_size = np.empty((batch,), np.int32)
    rc = lib.pad_collate(
        _ptr(coords, ctypes.c_float), _ptr(one_hot, ctypes.c_float),
        _ptr(offsets, ctypes.c_int64), batch, n_max, nf,
        _ptr(out_x, ctypes.c_float), _ptr(out_oh, ctypes.c_float),
        _ptr(out_mask, ctypes.c_float), _ptr(out_size, ctypes.c_int32))
    if rc != 0:
        raise ValueError(f"complex exceeds padded size {n_max}")
    return out_x, out_oh, out_mask, out_size


def pad_collate_gather(coords: np.ndarray, one_hot: np.ndarray,
                       offsets: np.ndarray, indices: np.ndarray, n_max: int):
    """Native shuffled-batch padded collate; returns arrays or None."""
    lib = _load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.float32)
    one_hot = np.ascontiguousarray(one_hot, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    batch = len(indices)
    nf = one_hot.shape[1]
    out_x = np.empty((batch, n_max, 3), np.float32)
    out_oh = np.empty((batch, n_max, nf), np.float32)
    out_mask = np.empty((batch, n_max), np.float32)
    out_size = np.empty((batch,), np.int32)
    rc = lib.pad_collate_gather(
        _ptr(coords, ctypes.c_float), _ptr(one_hot, ctypes.c_float),
        _ptr(offsets, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        batch, n_max, nf,
        _ptr(out_x, ctypes.c_float), _ptr(out_oh, ctypes.c_float),
        _ptr(out_mask, ctypes.c_float), _ptr(out_size, ctypes.c_int32))
    if rc != 0:
        raise ValueError(f"complex exceeds padded size {n_max}")
    return out_x, out_oh, out_mask, out_size


def perceive_bonds(coords: np.ndarray, types: np.ndarray,
                   dataset_info) -> Optional[List[Tuple[int, int, int]]]:
    """Native EDM bond perception; returns bond triples or None."""
    lib = _load()
    if lib is None:
        return None
    from diffsbdd_tpu.constants import MARGINS
    coords = np.ascontiguousarray(coords, np.float32)
    types = np.ascontiguousarray(types, np.int32)
    n = len(coords)
    b1 = np.ascontiguousarray(dataset_info["bonds1"], np.float64)
    b2 = np.ascontiguousarray(dataset_info["bonds2"], np.float64)
    b3 = np.ascontiguousarray(dataset_info["bonds3"], np.float64)
    max_bonds = max(n * (n - 1) // 2, 1)
    out = np.empty((max_bonds, 3), np.int32)
    count = lib.perceive_bonds(
        _ptr(coords, ctypes.c_float), _ptr(types, ctypes.c_int32), n,
        _ptr(b1, ctypes.c_double), _ptr(b2, ctypes.c_double),
        _ptr(b3, ctypes.c_double), b1.shape[0],
        float(MARGINS[0]), float(MARGINS[1]), float(MARGINS[2]),
        _ptr(out, ctypes.c_int32), max_bonds)
    if count < 0:
        raise RuntimeError("bond buffer overflow")
    return [tuple(int(v) for v in row) for row in out[:count]]


def build(verbose: bool = False) -> bool:
    """Compile the native library in-place (requires g++)."""
    import subprocess
    res = subprocess.run(["make", "-C", str(_LIB_PATH.parent)],
                         capture_output=not verbose)
    global _lib
    _lib = None  # force reload
    return res.returncode == 0 and available()
