"""ctypes bindings for the native host runtime (native/vrhost.cpp).

Builds libvrhost.so on first use if the toolchain is available; every entry
point has a numpy fallback, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvrhost.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
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
    lib.vr_version.restype = ctypes.c_int32
    lib.vr_morton_keys.argtypes = [_f32p, ctypes.c_int64, _f32p, _f32p, _i32p]
    lib.vr_cell_keys.argtypes = [_f32p, ctypes.c_int64, _f32p, _f32p, _i32p,
                                 ctypes.c_int32, _i32p]
    lib.vr_counting_sort.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int64,
                                     _i32p, _i64p]
    lib.vr_gather_f32x3.argtypes = [_f32p, _i32p, ctypes.c_int64, _f32p]
    lib.vr_gather_f32.argtypes = [_f32p, _i32p, ctypes.c_int64, _f32p]
    lib.vr_wrap_positions.argtypes = [_f32p, ctypes.c_int64, _f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def morton_keys(pos: np.ndarray, lo, hi) -> np.ndarray:
    pos = np.ascontiguousarray(pos, np.float32)
    n = len(pos)
    lo = np.asarray(lo, np.float32)
    ext = np.asarray(hi, np.float32) - lo
    lib = get_lib()
    if lib is None:  # numpy fallback
        from ..ops.cells import morton_keys as jk
        import jax.numpy as jnp

        return np.asarray(jk(jnp.asarray(pos), lo, lo + ext))
    out = np.empty(n, np.int32)
    lib.vr_morton_keys(pos, n, np.ascontiguousarray(lo),
                       np.ascontiguousarray(ext), out)
    return out


def cell_keys(pos: np.ndarray, origin, width, ncells,
              periodic: bool) -> np.ndarray:
    pos = np.ascontiguousarray(pos, np.float32)
    n = len(pos)
    origin = np.asarray(origin, np.float32)
    inv_w = (1.0 / np.asarray(width, np.float64)).astype(np.float32)
    nc = np.asarray(ncells, np.int32)
    lib = get_lib()
    if lib is None:
        c = np.floor((pos - origin) * inv_w).astype(np.int64)
        if periodic:
            c = np.mod(c, nc)
        else:
            c = np.clip(c, 0, nc - 1)
        return ((c[:, 0] * nc[1] + c[:, 1]) * nc[2] + c[:, 2]).astype(np.int32)
    out = np.empty(n, np.int32)
    lib.vr_cell_keys(pos, n, origin, inv_w, np.ascontiguousarray(nc),
                     int(periodic), out)
    return out


def counting_sort(keys: np.ndarray, nbuckets: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """(perm, offsets): stable counting sort of int32 keys in [0,nbuckets)."""
    keys = np.ascontiguousarray(keys, np.int32)
    n = len(keys)
    lib = get_lib()
    if lib is None:
        perm = np.argsort(keys, kind="stable").astype(np.int32)
        offsets = np.searchsorted(keys[perm],
                                  np.arange(nbuckets + 1)).astype(np.int64)
        return perm, offsets
    perm = np.empty(n, np.int32)
    offsets = np.empty(nbuckets + 1, np.int64)
    lib.vr_counting_sort(keys, n, nbuckets, perm, offsets)
    return perm, offsets


def gather(src: np.ndarray, perm: np.ndarray) -> np.ndarray:
    src = np.ascontiguousarray(src, np.float32)
    perm = np.ascontiguousarray(perm, np.int32)
    lib = get_lib()
    if lib is None:
        return src[perm]
    out = np.empty((len(perm),) + src.shape[1:], np.float32)
    if src.ndim == 2 and src.shape[1] == 3:
        lib.vr_gather_f32x3(src, perm, len(perm), out)
    elif src.ndim == 1:
        lib.vr_gather_f32(src, perm, len(perm), out)
    else:
        return src[perm]
    return out


def wrap_positions(pos: np.ndarray, boxsize: float) -> np.ndarray:
    pos = np.ascontiguousarray(pos, np.float32)
    lib = get_lib()
    if lib is None:
        return np.mod(pos, boxsize)
    box = np.full(3, boxsize, np.float32)
    lib.vr_wrap_positions(pos, len(pos), box)
    return pos
