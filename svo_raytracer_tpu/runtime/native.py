"""ctypes bindings for the native runtime (runtime/svo_codec.cc).

Auto-builds ``libsvocodec.so`` with the repo Makefile on first use if a
toolchain is available; falls back to the pure-Python codec
(``core/svo_format.py``) otherwise.  Both implementations are cross-checked
byte-for-byte in tests/test_native_codec.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..core.octree import Octree
from ..utils import constants as C

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime")
_SO_PATH = os.path.join(_RUNTIME_DIR, "libsvocodec.so")

_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.svo_import.restype = ctypes.c_int64
    lib.svo_import.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.svo_export.restype = ctypes.c_int64
    lib.svo_export.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def import_svo(data: bytes, world_size: int = C.WORLD_SIZE) -> Octree:
    """Native fast path of core.svo_format.import_svo."""
    lib = _load()
    if lib is None:
        from ..core import svo_format

        return svo_format.import_svo(data, world_size)
    capacity = max(16, len(data) + 8)
    child = np.zeros(capacity, np.int32)
    mask = np.zeros(capacity, np.int32)
    value = np.zeros(capacity, np.int32)
    normal = np.zeros(capacity, np.int32)
    n = lib.svo_import(data, len(data), _i32ptr(child), _i32ptr(mask),
                       _i32ptr(value), _i32ptr(normal), capacity)
    if n < 0:
        raise ValueError(f"svo_import failed with code {n}")
    return Octree(child=child[:n].copy(), mask=mask[:n].copy(),
                  value=value[:n].copy(), normal=normal[:n].copy(),
                  n_nodes=int(n), world_size=world_size)


def export_svo(tree: Octree) -> bytes:
    """Native fast path of core.svo_format.export_svo."""
    lib = _load()
    t = tree.to_numpy()
    if lib is None:
        from ..core import svo_format

        return svo_format.export_svo(t)
    child = np.ascontiguousarray(t.child[:t.n_nodes], np.int32)
    mask = np.ascontiguousarray(t.mask[:t.n_nodes], np.int32)
    value = np.ascontiguousarray(t.value[:t.n_nodes], np.int32)
    normal = np.ascontiguousarray(t.normal[:t.n_nodes], np.int32)
    size = lib.svo_export(_i32ptr(child), _i32ptr(mask), _i32ptr(value),
                          _i32ptr(normal), t.n_nodes, None, 0)
    if size < 0:
        raise ValueError(f"svo_export sizing failed with code {size}")
    out = np.zeros(size, np.uint8)
    rc = lib.svo_export(_i32ptr(child), _i32ptr(mask), _i32ptr(value),
                        _i32ptr(normal), t.n_nodes,
                        out.ctypes.data_as(ctypes.c_void_p), size)
    if rc < 0:
        raise ValueError(f"svo_export failed with code {rc}")
    return out.tobytes()
