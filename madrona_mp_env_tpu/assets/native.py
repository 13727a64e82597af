"""ctypes bindings for the native (C++) runtime components.

Wraps native/libmpenv_native.so: the offline asset precompute (triangle
adjacency + all-pairs A* next-hop table — the reference's buildAStarLookup,
src/mgr.cpp:1155-1211) and raw record-stream I/O. Auto-builds via make on
first use if a compiler is available; every entry point has a NumPy
fallback so the library is optional.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmpenv_native.so")

_lib = None
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted:
        return None
    _load_attempted = True

    if not os.path.exists(_LIB_PATH) and os.environ.get(
        "MPENV_NO_NATIVE_BUILD"
    ) is None:
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None

    lib = ctypes.CDLL(_LIB_PATH)

    lib.mpenv_tri_adjacency.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mpenv_astar_next_hop.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mpenv_writer_open.argtypes = [ctypes.c_char_p]
    lib.mpenv_writer_open.restype = ctypes.c_void_p
    lib.mpenv_writer_append.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.mpenv_writer_append.restype = ctypes.c_int64
    lib.mpenv_writer_close.argtypes = [ctypes.c_void_p]
    lib.mpenv_read_records.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.mpenv_read_records.restype = ctypes.c_int64
    lib.mpenv_count_records.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.mpenv_count_records.restype = ctypes.c_int64

    _lib = lib
    return lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def tri_adjacency(tri_indices: np.ndarray) -> Optional[np.ndarray]:
    """Native triangle adjacency; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tri_indices, np.int32)
    n = tris.shape[0]
    out = np.empty((n, 3), np.int32)
    lib.mpenv_tri_adjacency(_i32p(tris), n, _i32p(out))
    return out


def astar_next_hop(
    centroids: np.ndarray, adjacency: np.ndarray
) -> Optional[np.ndarray]:
    """Native all-pairs next-hop table; None if unavailable."""
    lib = load()
    if lib is None:
        return None
    cents = np.ascontiguousarray(centroids, np.float32)
    adj = np.ascontiguousarray(adjacency, np.int32)
    n = cents.shape[0]
    out = np.empty((n, n), np.int32)
    lib.mpenv_astar_next_hop(_f32p(cents), _i32p(adj), n, _i32p(out))
    return out


class NativeRecordWriter:
    """Raw fixed-size record stream appender (fwrite-backed)."""

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.mpenv_writer_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")

    def append(self, records: np.ndarray) -> int:
        rec = np.ascontiguousarray(records)
        return self._lib.mpenv_writer_append(
            self._h,
            rec.ctypes.data_as(ctypes.c_void_p),
            rec.dtype.itemsize,
            len(rec),
        )

    def close(self):
        if self._h:
            self._lib.mpenv_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_records(
    path: str, dtype: np.dtype, start: int = 0, count: int = -1
) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    total = lib.mpenv_count_records(path.encode(), dtype.itemsize)
    if count < 0:
        count = total - start
    out = np.empty(count, dtype)
    got = lib.mpenv_read_records(
        path.encode(),
        dtype.itemsize,
        start,
        count,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out[:got]
