"""ctypes bridge to the native symbolic kernels (native/symbolic.cpp).

Mirrors the reference's native boundary: where sparse-cholesky.lisp binds
CHOLMOD through sb-alien and wrapper.c exposes struct accessors, the TPU
build compiles its own graph kernels into libcimsymbolic.so and calls them
via ctypes.  Everything degrades gracefully to the pure-Python
implementations in sparse.symbolic when the library is missing and cannot
be built (no compiler, read-only checkout, ...).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np
import scipy.sparse as sp

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcimsymbolic.so")

_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    # Always invoke make: a no-op when the .so is current, a rebuild when
    # symbolic.cpp changed (an exists-check would keep loading a stale lib).
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass  # read-only checkout / no compiler: try the existing .so
    if not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    lib.cim_etree.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
    lib.cim_postorder.argtypes = [ctypes.c_int64, i64p, i64p]
    lib.cim_colcounts.argtypes = [
        ctypes.c_int64, i64p, i64p, i64p, i64p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ]
    lib.cim_amd.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
    lib.cim_amd.restype = ctypes.c_int64
    lib.cim_block_mask.argtypes = [
        ctypes.c_int64, i64p, i64p, i64p, ctypes.c_int64, u8p,
    ]
    if hasattr(lib, "cim_block_mask_slots"):  # older .so may lack it
        lib.cim_block_mask_slots.argtypes = [
            ctypes.c_int64, i64p, i64p, i64p, ctypes.c_int64, i64p,
            ctypes.c_int64, u8p,
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _csc_arrays(N: sp.spmatrix):
    C = sp.csc_matrix(N)
    C.sort_indices()
    indptr = np.ascontiguousarray(C.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(C.indices, dtype=np.int64)
    return C.shape[0], indptr, indices


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def amd_order(N: sp.spmatrix) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n, indptr, indices = _csc_arrays(N)
    perm = np.empty(n, dtype=np.int64)
    rc = lib.cim_amd(n, _ptr(indptr), _ptr(indices), _ptr(perm))
    return perm if rc == 0 else None


def elimination_tree(N: sp.spmatrix) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n, indptr, indices = _csc_arrays(N)
    parent = np.empty(n, dtype=np.int64)
    lib.cim_etree(n, _ptr(indptr), _ptr(indices), _ptr(parent))
    return parent


def postorder(parent: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    parent = np.ascontiguousarray(parent, dtype=np.int64)
    post = np.empty(len(parent), dtype=np.int64)
    lib.cim_postorder(len(parent), _ptr(parent), _ptr(post))
    return post


def column_counts(N: sp.spmatrix, parent: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    n, indptr, indices = _csc_arrays(N)
    parent = np.ascontiguousarray(parent, dtype=np.int64)
    counts = np.empty(n, dtype=np.int64)
    nnz = ctypes.c_int64()
    flops = ctypes.c_double()
    lib.cim_colcounts(
        n, _ptr(indptr), _ptr(indices), _ptr(parent), _ptr(counts),
        ctypes.byref(nnz), ctypes.byref(flops),
    )
    return counts, int(nnz.value), float(flops.value)


def block_mask_slots(
    N: sp.spmatrix, parent: np.ndarray, block: int, slots: np.ndarray, B: int
):
    lib = _load()
    if lib is None or not hasattr(lib, "cim_block_mask_slots"):
        return None
    n, indptr, indices = _csc_arrays(N)
    parent = np.ascontiguousarray(parent, dtype=np.int64)
    slots = np.ascontiguousarray(slots, dtype=np.int64)
    mask = np.zeros((B, B), dtype=np.uint8)
    lib.cim_block_mask_slots(
        n, _ptr(indptr), _ptr(indices), _ptr(parent), block, _ptr(slots), B,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return mask.astype(bool)


def block_mask(N: sp.spmatrix, parent: np.ndarray, block: int):
    lib = _load()
    if lib is None:
        return None
    n, indptr, indices = _csc_arrays(N)
    parent = np.ascontiguousarray(parent, dtype=np.int64)
    B = (n + block - 1) // block
    mask = np.zeros((B, B), dtype=np.uint8)
    lib.cim_block_mask(
        n, _ptr(indptr), _ptr(indices), _ptr(parent), block,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return mask.astype(bool)
