"""ctypes bindings for the native (C++) data-path runtime.

``libgfe_io.so`` (native/gfe_io.cpp) provides gzip NIfTI-1 decode,
trilinear resample, adaptive normalization, and a threaded batch
loader.  This module builds the library on demand (make -C native) and
degrades gracefully to the pure-Python codec when a toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgfe_io.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=240)
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.gfe_load_volume.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.gfe_load_volume.restype = ctypes.c_int
    lib.gfe_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.gfe_load_batch.restype = ctypes.c_int
    lib.gfe_decode_nifti.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
    lib.gfe_decode_nifti.restype = ctypes.c_int
    lib.gfe_free.argtypes = [ctypes.c_void_p]
    lib.gfe_version.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def load_volume(path: str, target_shape, normalize: bool = True) -> np.ndarray:
    """Decode + (optional) adaptive-normalize + trilinear resample one
    NIfTI file natively.  Returns (x, y, z) float32."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    shape = (ctypes.c_int64 * 3)(*[int(s) for s in target_shape])
    out = np.empty(tuple(target_shape), np.float32)
    rc = lib.gfe_load_volume(
        path.encode(), shape, int(normalize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"native NIfTI decode failed ({rc}) for {path}")
    # native fills Fortran-order (x fastest); out was allocated C-order
    # over (x, y, z) -> reinterpret
    flat = out.reshape(-1)
    return flat.reshape(tuple(target_shape), order="F").copy()


def load_batch(paths, target_shape, normalize: bool = True,
               num_threads: int = 4) -> np.ndarray:
    """Threaded native decode of many files -> (n, x, y, z) float32."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    shape = (ctypes.c_int64 * 3)(*[int(s) for s in target_shape])
    out = np.empty((n,) + tuple(target_shape), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.gfe_load_batch(
        arr, n, shape, int(normalize), num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if failures:
        raise IOError(f"native batch decode: {failures}/{n} failures")
    flat = out.reshape(n, -1)
    return np.stack([
        flat[i].reshape(tuple(target_shape), order="F") for i in range(n)
    ])


def decode_nifti(path: str) -> np.ndarray:
    """Raw native decode (no resample/normalize)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    data = ctypes.POINTER(ctypes.c_float)()
    shape = (ctypes.c_int64 * 7)()
    ndim = ctypes.c_int()
    rc = lib.gfe_decode_nifti(path.encode(), ctypes.byref(data), shape,
                              ctypes.byref(ndim))
    if rc != 0:
        raise IOError(f"native NIfTI decode failed ({rc}) for {path}")
    dims = tuple(shape[i] for i in range(ndim.value))
    count = int(np.prod(dims))
    try:
        arr = np.ctypeslib.as_array(data, shape=(count,)).copy()
    finally:
        lib.gfe_free(data)
    return arr.reshape(dims, order="F")
