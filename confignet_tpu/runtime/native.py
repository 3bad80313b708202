"""ctypes bindings for the C++ batch sampler, with transparent numpy
fallback when no compiler is available.

The shared library builds on first use (g++, cached beside this file); set
``CONFIGNET_TPU_DISABLE_NATIVE=1`` to force the numpy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_RUNTIME_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_RUNTIME_DIR, "batch_sampler.cpp")
_LIB = os.path.join(_RUNTIME_DIR, "libbatch_sampler.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build_library() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB, _SRC, "-lpthread",
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, timeout=120)
        return result.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("CONFIGNET_TPU_DISABLE_NATIVE"):
        _load_failed = True
        return None
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build_library():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.gather_rows.argtypes = [
            u8p, ctypes.c_int64, i64p, ctypes.c_int64, u8p, ctypes.c_int,
        ]
        lib.gather_images_with_flip.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, u8p, ctypes.c_int64, u8p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _n_threads() -> int:
    return max(1, (os.cpu_count() or 1) - 1) or 1


def gather_rows(array: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """array[indices] for a C-contiguous uint8 array of any row shape."""
    lib = _get_lib()
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if lib is None or array.dtype != np.uint8 or not array.flags["C_CONTIGUOUS"]:
        return np.ascontiguousarray(array[indices])

    row_shape = array.shape[1:]
    row_bytes = int(np.prod(row_shape))
    out = np.empty((len(indices),) + row_shape, np.uint8)
    lib.gather_rows(
        array.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        row_bytes,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _n_threads(),
    )
    return out


def gather_images(images: np.ndarray, indices: np.ndarray,
                  flip_flags: Optional[np.ndarray] = None) -> np.ndarray:
    """images[indices] with per-image optional horizontal flip, fused."""
    lib = _get_lib()
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if lib is None or images.dtype != np.uint8 or not images.flags["C_CONTIGUOUS"]:
        out = np.ascontiguousarray(images[indices])
        if flip_flags is not None:
            for i, flip in enumerate(flip_flags):
                if flip:
                    out[i] = out[i][:, ::-1]
        return out

    n, h, w, c = images.shape[0], *images.shape[1:]
    out = np.empty((len(indices), h, w, c), np.uint8)
    flags_ptr = None
    if flip_flags is not None:
        flip_flags = np.ascontiguousarray(flip_flags, dtype=np.uint8)
        flags_ptr = flip_flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.gather_images_with_flip(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flags_ptr,
        len(indices),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _n_threads(),
    )
    return out
