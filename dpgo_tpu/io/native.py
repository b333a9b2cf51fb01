"""ctypes bindings for the native host runtime (native/libdpgo_native.so).

Builds the library on demand with `make` if the toolchain is available;
read_g2o_file_native falls back to the pure-Python parser otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from dpgo_tpu.io.g2o import Measurements, read_g2o_file as _py_read

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdpgo_native.so")
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.dpgo_parse_g2o.restype = ctypes.c_void_p
    lib.dpgo_parse_g2o.argtypes = [ctypes.c_char_p]
    lib.dpgo_error.restype = ctypes.c_char_p
    lib.dpgo_error.argtypes = [ctypes.c_void_p]
    lib.dpgo_num_edges.restype = ctypes.c_int64
    lib.dpgo_num_edges.argtypes = [ctypes.c_void_p]
    lib.dpgo_num_poses.restype = ctypes.c_int64
    lib.dpgo_num_poses.argtypes = [ctypes.c_void_p]
    lib.dpgo_dim.restype = ctypes.c_int
    lib.dpgo_dim.argtypes = [ctypes.c_void_p]
    lib.dpgo_copy.restype = None
    lib.dpgo_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
    lib.dpgo_free.restype = None
    lib.dpgo_free.argtypes = [ctypes.c_void_p]
    lib.dpgo_max_clique.restype = ctypes.c_int64
    lib.dpgo_max_clique.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int, ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def max_clique_native(adj: np.ndarray, exact: bool = True
                      ) -> np.ndarray | None:
    """Maximum clique of a boolean adjacency matrix via the native solver
    (the reference's fmc library, C++/PCM/fmc). Returns the membership mask,
    or None when the native library is unavailable (callers fall back to the
    Python implementation in dpgo_tpu/pcm.py)."""
    lib = _load()
    if lib is None:
        return None
    n = adj.shape[0]
    a = np.ascontiguousarray(adj, dtype=np.uint8)
    out = np.zeros(n, np.uint8)
    lib.dpgo_max_clique(a.ctypes.data_as(ctypes.c_void_p), n,
                        1 if exact else 0,
                        out.ctypes.data_as(ctypes.c_void_p))
    return out.astype(bool)


def read_g2o_file_native(filename: str) -> Measurements:
    """Parse via the native library; falls back to the Python parser."""
    lib = _load()
    if lib is None:
        return _py_read(filename)
    h = lib.dpgo_parse_g2o(filename.encode())
    try:
        err = lib.dpgo_error(h)
        if err:
            raise ValueError(f"native g2o parse failed: {err.decode()}")
        m = lib.dpgo_num_edges(h)
        d = lib.dpgo_dim(h)
        P = lib.dpgo_num_poses(h)
        i = np.empty(m, np.int64)
        j = np.empty(m, np.int64)
        R = np.empty((m, d, d), np.float64)
        t = np.empty((m, d), np.float64)
        kappa = np.empty(m, np.float64)
        tau = np.empty(m, np.float64)
        lib.dpgo_copy(
            h, i.ctypes.data_as(ctypes.c_void_p),
            j.ctypes.data_as(ctypes.c_void_p),
            R.ctypes.data_as(ctypes.c_void_p),
            t.ctypes.data_as(ctypes.c_void_p),
            kappa.ctypes.data_as(ctypes.c_void_p),
            tau.ctypes.data_as(ctypes.c_void_p))
        return Measurements(i=i, j=j, R=R, t=t, kappa=kappa, tau=tau,
                            num_poses=int(P), d=d)
    finally:
        lib.dpgo_free(h)
