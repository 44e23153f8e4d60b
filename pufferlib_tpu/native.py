"""ctypes loader for the C++ envpool driver core (csrc/envpool.cpp).

Builds libpufferpool.so on first use (g++ -O3) and caches it next to the
source. Falls back cleanly (returns None) when no compiler is available —
the Python spin loop in vector_host keeps working.
"""
import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'csrc')


def _build():
    src = os.path.join(_CSRC, 'envpool.cpp')
    out = os.path.join(_CSRC, 'libpufferpool.so')
    if os.path.exists(out) and os.path.getmtime(out) > os.path.getmtime(src):
        return out
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-o', out, src]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load():
    """Returns the loaded library or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        path = _build()
        lib = ctypes.CDLL(path)
        lib.wait_ready.restype = ctypes.c_int
        lib.wait_ready.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.gather_blocks.restype = None
        lib.gather_blocks.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int64]
        lib.scatter_blocks.restype = None
        lib.scatter_blocks.argtypes = lib.gather_blocks.argtypes
        lib.signal_workers.restype = None
        lib.signal_workers.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_uint8]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def wait_ready(lib, sem_arr, candidates, needed, timeout_us=-1,
        spin_us=500_000):
    """Spin (GIL released inside C) until `needed` of `candidates` are
    ready; returns their indices in completion order. spin_us=0 naps
    from the start — required when workers outnumber cores, where a
    hot-spinning driver starves the workers it is waiting on."""
    candidates = np.ascontiguousarray(candidates, dtype=np.int32)
    out = np.empty(needed, dtype=np.int32)
    n = lib.wait_ready(
        sem_arr.ctypes.data, len(sem_arr),
        candidates.ctypes.data, len(candidates), needed,
        out.ctypes.data, timeout_us, spin_us)
    if n < 0:
        raise TimeoutError('wait_ready timed out')
    return out[:n]


def gather_rows(lib, src, dst, row_indices, row_bytes):
    """dst[b] = src rows at row_indices (contiguous row-major blocks)."""
    offsets = np.ascontiguousarray(row_indices, np.int64) * row_bytes
    lib.gather_blocks(src.ctypes.data, dst.ctypes.data,
        offsets.ctypes.data, len(offsets), row_bytes)


def scatter_rows(lib, src, dst, row_indices, row_bytes):
    offsets = np.ascontiguousarray(row_indices, np.int64) * row_bytes
    lib.scatter_blocks(src.ctypes.data, dst.ctypes.data,
        offsets.ctypes.data, len(offsets), row_bytes)
