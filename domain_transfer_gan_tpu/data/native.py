"""ctypes bindings for the native (C++) data-loading tier
(csrc/npz_loader.cc): threaded .npz/.npy batch reads with fused reference
normalization.  Falls back to the pure-numpy path transparently when the
shared library has not been built (`make -C domain_transfer_gan_tpu/csrc`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB = None
_LIB_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "csrc")
_SO = os.path.join(_CSRC, "libnpzloader.so")


def _build_if_needed() -> bool:
    src = os.path.join(_CSRC, "npz_loader.cc")
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not _build_if_needed():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.npz_read_f32.restype = ctypes.c_int
    lib.npz_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.npz_read_f32_ex.restype = ctypes.c_int
    lib.npz_read_f32_ex.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_char)]
    lib.npz_load_batch_f32.restype = ctypes.c_int
    lib.npz_load_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.batch_normalize_f32.restype = None
    lib.batch_normalize_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def read_npz_f32(path: str, member: str = "data",
                 return_kind: bool = False):
    """Read one npz/npy member as float32 via the native reader.

    With return_kind, also returns the source dtype kind ('f'/'i'/'u'/'b')
    so callers can preserve integer-image scaling (uint8 -> /255).
    """
    lib = get_lib()
    if lib is None:
        return (None, None) if return_kind else None
    shape = (ctypes.c_int64 * 8)()
    kind = ctypes.c_char(b"f")
    ndim = lib.npz_read_f32_ex(path.encode(), member.encode(), None, 0,
                               shape, ctypes.byref(kind))
    if ndim < 0:
        return (None, None) if return_kind else None
    dims = tuple(shape[i] for i in range(ndim))
    out = np.empty(dims, dtype=np.float32)
    ndim2 = lib.npz_read_f32_ex(
        path.encode(), member.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size, shape,
        ctypes.byref(kind))
    if ndim2 < 0:
        return (None, None) if return_kind else None
    if return_kind:
        return out, kind.value.decode()
    return out


def load_batch_f32(paths: Sequence[str], h: int, w: int, c: int,
                   member: str = "data", normalize: bool = True,
                   n_threads: int = 0) -> Optional[np.ndarray]:
    """Threaded batch load of same-shaped per-file samples -> (n,h,w,c)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, h, w, c), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.npz_load_batch_f32(
        arr, n, member.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, int(normalize), n_threads)
    if rc != 0:
        return None
    return out


def normalize_batch_inplace(arr: np.ndarray, n_threads: int = 0) -> bool:
    """Native in-place reference normalization of an NHWC batch."""
    lib = get_lib()
    if lib is None or arr.dtype != np.float32 or not arr.flags.c_contiguous:
        return False
    n, h, w, c = arr.shape
    lib.batch_normalize_f32(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, h * w, c,
        n_threads)
    return True
