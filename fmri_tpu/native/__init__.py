"""Native (C++) host-side data-loader kernels, with a pure-numpy fallback.

The reference's host data path runs in torch's C++ DataLoader workers
(``data_loader.py:23``, ``train_vgan_stage1.py:195-196``); this package is
the framework's native runtime counterpart for the packed/mmap streaming
store: shuffled row gather, fused uint8->float32 dequantization, and
madvise readahead, implemented in ``loader.cc`` and loaded through ctypes
(which releases the GIL for the duration of each call — the input
pipeline's producer thread gathers truly concurrently with Python).

The shared library is compiled on first use with the system ``g++`` and
cached under ``_cache/`` keyed by the source hash; if no toolchain is
available (or ``FMRI_TPU_NATIVE=0``), every entry point silently falls
back to numpy, so the framework never *requires* the native path.

Public API
----------
``available()``            -> bool — native library loaded?
``gather(arr, idx)``       -> arr[idx] for 1-D int64 ``idx`` over axis 0.
``gather_dequant(u8, idx)``-> float32 ``u8[idx] / 255`` in one fused pass.
``prefetch(arr, idx)``     -> madvise(WILLNEED) the rows' pages (no-op
                              fallback); returns True if issued natively.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_lib = None
_lib_err: Optional[str] = None
_lock = threading.Lock()
_ABI = 1


def _threads_default() -> int:
    if "FMRI_TPU_NATIVE_THREADS" in os.environ:
        return max(1, int(os.environ["FMRI_TPU_NATIVE_THREADS"]))
    return max(1, min(8, os.cpu_count() or 1))


def _load():
    """Build (if needed) and dlopen the loader library once per process."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        if os.environ.get("FMRI_TPU_NATIVE", "1") in ("0", "false", "no"):
            _lib_err = "disabled via FMRI_TPU_NATIVE=0"
            return None
        try:
            from fmri_tpu.native.build import build_library

            lib = ctypes.CDLL(build_library())
            lib.ft_abi_version.restype = ctypes.c_int64
            if lib.ft_abi_version() != _ABI:
                raise RuntimeError(
                    f"loader ABI {lib.ft_abi_version()} != expected {_ABI}")
            lib.ft_gather_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
            lib.ft_gather_u8_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_float,
                ctypes.c_int]
            lib.ft_prefetch_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64]
            _lib = lib
        except Exception as e:  # no toolchain / build failure -> numpy path
            _lib_err = f"{type(e).__name__}: {e}"
        return _lib


def available() -> bool:
    return _load() is not None


def why_unavailable() -> Optional[str]:
    """Human-readable reason the native path is off (None if it is on)."""
    _load()
    return _lib_err


def _rows_ok(arr: np.ndarray) -> bool:
    """Native kernels address rows as base + i*row_bytes: the array must be
    C-contiguous (memmaps opened by the packed store are) and must not hold
    Python objects — memcpy'ing PyObject pointers would skip refcounting
    (double-free on collection), so object/structured-with-object dtypes
    take the numpy fallback."""
    return (arr.flags["C_CONTIGUOUS"] and arr.ndim >= 1 and arr.size > 0
            and not arr.dtype.hasobject)


def _check_out(out: np.ndarray, shape: tuple, dtype) -> np.ndarray:
    """The native kernels write raw bytes through ``out``'s base pointer;
    a wrong shape/dtype/layout would corrupt the heap, so validate exactly
    what the numpy fallback's broadcasting assignment would enforce."""
    if out.shape != shape:
        raise ValueError(f"out shape {out.shape} != expected {shape}")
    if out.dtype != dtype:
        raise TypeError(f"out dtype {out.dtype} != expected {np.dtype(dtype)}")
    if not out.flags["C_CONTIGUOUS"] or not out.flags["WRITEABLE"]:
        raise ValueError("out must be C-contiguous and writeable")
    return out


def _idx64(idx: np.ndarray, n_rows: int) -> np.ndarray:
    """Normalize and bound-check indices BEFORE the native/fallback branch:
    both paths share one contract (in particular, negative indices raise on
    both — numpy's silent wraparound on the fallback path would make the
    same call behave differently across hosts)."""
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if idx.ndim != 1:
        raise ValueError(f"idx must be 1-D, got shape {idx.shape}")
    if idx.size and (idx.min() < 0 or idx.max() >= n_rows):
        raise IndexError(
            f"gather index out of range [0, {n_rows}) (negative indices are "
            f"rejected on every path)")
    return idx


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return ctypes.c_void_p(a.ctypes.data)


def gather(arr: np.ndarray, idx: np.ndarray, *,
           out: Optional[np.ndarray] = None,
           threads: Optional[int] = None) -> np.ndarray:
    """``arr[idx]`` over axis 0 (any dtype), natively when possible."""
    lib = _load()
    idx = _idx64(idx, arr.shape[0])
    if lib is None or not _rows_ok(arr):
        res = arr[idx]
        if out is not None:
            _check_out(out, res.shape, res.dtype)
            out[...] = res
            return out
        return res
    row_bytes = arr.dtype.itemsize * int(np.prod(arr.shape[1:], dtype=np.int64))
    if out is None:
        out = np.empty((idx.size, *arr.shape[1:]), dtype=arr.dtype)
    else:
        _check_out(out, (idx.size, *arr.shape[1:]), arr.dtype)
    lib.ft_gather_rows(_ptr(arr), row_bytes, _ptr(idx), idx.size, _ptr(out),
                       threads or _threads_default())
    return out


def gather_dequant(arr: np.ndarray, idx: np.ndarray, *,
                   scale: float = 1.0 / 255.0,
                   out: Optional[np.ndarray] = None,
                   threads: Optional[int] = None) -> np.ndarray:
    """Fused ``arr[idx].astype(float32) * scale`` for uint8 ``arr`` — the
    packed store's codec (`fmri_tpu/data/packed.py`) decoded without
    materializing the intermediate uint8 batch."""
    if arr.dtype != np.uint8:
        raise TypeError(f"gather_dequant expects uint8, got {arr.dtype}")
    lib = _load()
    idx = _idx64(idx, arr.shape[0])
    if lib is None or not _rows_ok(arr):
        res = arr[idx].astype(np.float32) * np.float32(scale)
        if out is not None:
            _check_out(out, res.shape, res.dtype)
            out[...] = res
            return out
        return res
    row_elems = int(np.prod(arr.shape[1:], dtype=np.int64))
    if out is None:
        out = np.empty((idx.size, *arr.shape[1:]), dtype=np.float32)
    else:
        _check_out(out, (idx.size, *arr.shape[1:]), np.float32)
    lib.ft_gather_u8_f32(_ptr(arr), row_elems, _ptr(idx), idx.size,
                         _ptr(out), ctypes.c_float(scale),
                         threads or _threads_default())
    return out


def prefetch(arr: np.ndarray, idx: np.ndarray) -> bool:
    """Hint the kernel to read ahead the pages holding ``arr[idx]`` (cheap:
    madvise only, no copies).  Only meaningful for memory-mapped arrays;
    harmless on in-RAM arrays.  Returns True if the native hint was issued."""
    lib = _load()
    if lib is None or not _rows_ok(arr):
        return False
    idx = _idx64(idx, arr.shape[0])
    if idx.size == 0:
        return True
    row_bytes = arr.dtype.itemsize * int(np.prod(arr.shape[1:], dtype=np.int64))
    lib.ft_prefetch_rows(_ptr(arr), row_bytes, _ptr(idx), idx.size)
    return True
