"""ctypes binding for the native batch assembler (csrc/batch_gather.cpp).

Compiles the shared library on first use with the system g++ (cached under
``~/.cache/triplegan_tpu_native``), and falls back to numpy fancy indexing
transparently if no toolchain is available — the native path is a host-side
throughput optimization, never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CACHE_DIR = os.path.expanduser("~/.cache/triplegan_tpu_native")
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "batch_gather.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so = os.path.join(_CACHE_DIR, "batch_gather.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            src, "-o", so + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.gather_rows_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
    ]
    lib.gather_rows_u8.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if not _tried:
            _lib = _build()
            _tried = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def gather_rows(src: np.ndarray, idx: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """dst[i] = src[idx[i]] over axis 0, native when possible.

    ``src`` must be C-contiguous; any dtype (treated as raw row bytes).
    """
    lib = _get_lib()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    # One strict contract for both paths: raise on any out-of-range index.
    # (The C++ clamps as a memory-safety backstop and numpy would wrap
    # negatives — either silently masks a broken sampler.)
    if len(idx) and (int(idx.min()) < 0 or int(idx.max()) >= src.shape[0]):
        raise IndexError(
            f"gather_rows: index out of bounds for axis 0 with size {src.shape[0]}"
        )
    if lib is None or not src.flags.c_contiguous:
        return src[idx]
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    dst = np.empty((len(idx),) + src.shape[1:], dtype=src.dtype)
    lib.gather_rows_u8(
        src.ctypes.data_as(ctypes.c_void_p),
        src.shape[0],
        row_bytes,
        idx.ctypes.data_as(ctypes.c_void_p),
        len(idx),
        dst.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    return dst
