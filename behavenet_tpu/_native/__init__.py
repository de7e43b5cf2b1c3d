"""ctypes bindings for the native (C++) staging kernels.

``staging.cpp`` is compiled lazily on first use with the in-image ``g++``
(no pybind11 in the environment, so the binding layer is ctypes over a
plain C ABI). The shared object is cached next to this file, keyed by a
hash of the source, so a source edit rebuilds and stale builds are never
loaded. Everything degrades gracefully: if the compiler is missing, the
build fails, or ``BEHAVENET_NO_NATIVE=1`` is set, ``get_lib()`` returns
None and callers take their pure-Python path (bit-identical results,
enforced by tests/test_data/test_native.py).
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

__all__ = ['get_lib', 'pread_into', 'read_nchw_as_nhwc', 'native_threads']

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'staging.cpp')

_lock = threading.Lock()
_lib = None
_lib_tried = False


def native_threads(default=None):
    """Worker-thread budget for one staging call (BEHAVENET_NATIVE_THREADS)."""
    if default is None:
        default = min(8, os.cpu_count() or 1)
    try:
        return max(1, int(os.environ.get('BEHAVENET_NATIVE_THREADS', default)))
    except ValueError:
        return default


def _build():
    with open(_SRC, 'rb') as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_HERE, 'libbnstage_%s.so' % tag)
    if not os.path.exists(so_path):
        tmp = so_path + '.tmp.%d' % os.getpid()
        cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread',
               _SRC, '-o', tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)  # atomic: concurrent builders converge
    lib = ctypes.CDLL(so_path)
    lib.bn_pread.restype = ctypes.c_int
    lib.bn_pread.argtypes = [ctypes.c_int, ctypes.c_longlong,
                             ctypes.c_longlong, ctypes.c_void_p, ctypes.c_int]
    lib.bn_read_nchw_as_nhwc.restype = ctypes.c_int
    lib.bn_read_nchw_as_nhwc.argtypes = [
        ctypes.c_int, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_longlong, ctypes.c_int]
    return lib


def get_lib():
    """The loaded native library, or None when unavailable/disabled.

    ``BEHAVENET_NO_NATIVE`` is consulted on every call (not just at load),
    so tests and benchmarks can flip between the native and pure-Python
    paths inside one process.
    """
    global _lib, _lib_tried
    if os.environ.get('BEHAVENET_NO_NATIVE', '') not in ('', '0'):
        return None
    if _lib is not None or _lib_tried:
        return _lib
    with _lock:
        if _lib is None and not _lib_tried:
            _lib_tried = True
            try:
                _lib = _build()
            except Exception:
                _lib = None
    return _lib


def pread_into(fd, offset, out, nthreads=None):
    """Parallel pread of ``out.nbytes`` at ``offset`` into contiguous ``out``.

    Returns True on success; False means the caller must fall back (short
    read, or native lib unavailable).
    """
    lib = get_lib()
    if lib is None:
        return False
    assert out.flags['C_CONTIGUOUS']
    rc = lib.bn_pread(fd, offset, out.nbytes,
                      out.ctypes.data_as(ctypes.c_void_p),
                      native_threads(nthreads))
    return rc == 0


def read_nchw_as_nhwc(fd, offset, shape, dtype, t_pad=None, nthreads=None):
    """Fused read+transpose: (T,C,H,W) on disk -> fresh (t_pad,H,W,C) array.

    Frames [T, t_pad) are zero-filled (the bucket pad, fused for free).
    Returns None when the native path is unavailable or the read fails.
    """
    lib = get_lib()
    if lib is None:
        return None
    T, C, H, W = map(int, shape)
    dtype = np.dtype(dtype)
    if dtype.itemsize not in (1, 2, 4, 8) or dtype.hasobject:
        return None
    if t_pad is None:
        t_pad = T
    if t_pad < T:
        return None
    out = np.empty((t_pad, H, W, C), dtype=dtype)
    rc = lib.bn_read_nchw_as_nhwc(
        fd, offset, T, C, H, W, dtype.itemsize,
        out.ctypes.data_as(ctypes.c_void_p), t_pad, native_threads(nthreads))
    return out if rc == 0 else None
