"""On-demand g++ build of the native XYZ parser (io/cxyz.cpp).

Compiles once per source hash into __pycache__ next to the source, loads via
ctypes. No pybind11 dependency; plain C ABI.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None


def _source_path():
    return os.path.join(os.path.dirname(__file__), "cxyz.cpp")


def _so_path():
    src = _source_path()
    with open(src, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache = os.path.join(os.path.dirname(src), "__pycache__")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"_cxyz_{digest}.so")


def load():
    """Build (if needed) and load the native library. Raises on failure."""
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _so_path()
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so + ".tmp",
                 _source_path()],
                check=True, capture_output=True,
            )
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
        lib.cxyz_read.restype = ctypes.c_int
        lib.cxyz_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.cxyz_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return lib


def read_xyz_native(path):
    """Parse an XYZ trajectory with the C++ parser -> (frames, atoms, 3)."""
    import numpy as np

    lib = load()
    data = ctypes.POINTER(ctypes.c_double)()
    n_frames = ctypes.c_long()
    n_atoms = ctypes.c_long()
    rc = lib.cxyz_read(
        os.fsencode(path), ctypes.byref(data), ctypes.byref(n_frames),
        ctypes.byref(n_atoms),
    )
    if rc != 0:
        raise IOError(f"cxyz_read({path!r}) failed with code {rc}")
    n = n_frames.value * n_atoms.value * 3
    try:
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
    finally:
        lib.cxyz_free(data)
    return arr.reshape(n_frames.value, n_atoms.value, 3)
