"""Native C++ host components (built on demand with g++, loaded via ctypes).

Provides fast host-side Blake2s batch hashing, Merkle layer commits, and
the PoW grind -- used where per-call device dispatch would dominate (the
verifier, small trees, host fallback).  The device (jnp/Pallas) path stays
the default for bulk proving work.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_tstwo_native.so")
_SRC = os.path.join(_DIR, "blake2s.cpp")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO,
             _SRC],
            check=True, capture_output=True)
        return None
    except Exception as e:  # pragma: no cover
        return str(e)


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        _build_error = _build()
        if _build_error:
            return None
    lib = ctypes.CDLL(_SO)
    lib.blake2s_hash_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint32)]
    lib.blake2s_merkle_layer.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_size_t, ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint32)]
    lib.blake2s_grind.restype = ctypes.c_uint64
    lib.blake2s_grind.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32, ctypes.c_uint64,
        ctypes.c_uint64]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _u32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def hash_u32_batch(words: np.ndarray, byte_len: int) -> np.ndarray:
    """Batched blake2s over u32-word rows; mirrors ops.blake2s.hash_u32_batch."""
    lib = load()
    words = np.ascontiguousarray(words, dtype=np.uint32)
    n_msgs, n_words = words.shape
    out = np.empty((n_msgs, 8), dtype=np.uint32)
    lib.blake2s_hash_batch(_u32ptr(words), n_msgs, n_words, byte_len,
                           _u32ptr(out))
    return out


def merkle_layer(prev: Optional[np.ndarray],
                 columns: Sequence[np.ndarray], log_size: int) -> np.ndarray:
    lib = load()
    n = 1 << log_size
    out = np.empty((n, 8), dtype=np.uint32)
    cols = [np.ascontiguousarray(c, dtype=np.uint32) for c in columns]
    arr_t = ctypes.POINTER(ctypes.c_uint32) * max(1, len(cols))
    col_ptrs = arr_t(*[_u32ptr(c) for c in cols]) if cols else arr_t()
    prev_ptr = None
    if prev is not None:
        prev = np.ascontiguousarray(prev, dtype=np.uint32)
        prev_ptr = _u32ptr(prev)
    lib.blake2s_merkle_layer(prev_ptr, col_ptrs, len(cols), n, _u32ptr(out))
    return out


def grind(digest: bytes, pow_bits: int, start: int = 0,
          count: int = 1 << 40) -> int:
    lib = load()
    dw = np.frombuffer(digest, dtype="<u4").copy()
    res = lib.blake2s_grind(_u32ptr(dw), pow_bits, start, count)
    if res == (1 << 64) - 1:
        raise RuntimeError("grind exhausted")
    return int(res)
