"""JBIG2 mask codec: own native encoder with external-binary fallback.

The reference shells out to jbig2enc (``mrc.py:502-510``).  This module
prefers our in-tree C++ generic-region encoder (native/jbig2.cpp, built
on demand with g++ and loaded via ctypes); when a system ``jbig2``
binary exists it can be selected for byte-compatibility with jbig2enc.

``encode_jbig2(mask, embedded)`` -> bytes (embedded = PDF segment
stream, jbig2enc ``-p`` equivalent).  ``decode_jbig2`` round-trips our
own streams for verification.
"""

import ctypes
import os
import subprocess
import sys
from shutil import which

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'libjbig2tpu.so')

_lib = None


_SOURCES = ('jbig2.cpp', 'crypto.cpp')


def _build_native():
    srcs = [os.path.join(_NATIVE_DIR, f) for f in _SOURCES]
    cmd = ['g++', '-O3', '-fPIC', '-std=c++17', '-shared',
           '-o', _SO_PATH] + srcs
    subprocess.check_call(cmd)


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) or any(
            os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, f))
            for f in _SOURCES):
        _build_native()
    lib = ctypes.CDLL(_SO_PATH)
    lib.jbig2tpu_encode.restype = ctypes.c_long
    lib.jbig2tpu_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.jbig2tpu_encode_symbol.restype = ctypes.c_long
    lib.jbig2tpu_encode_symbol.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.jbig2tpu_decode.restype = ctypes.c_long
    lib.jbig2tpu_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def encode_jbig2(mask, embedded=True, tpgdon=True, symbol_mode=False):
    """Encode a bool/uint8 (H, W) mask to JBIG2 bytes.

    symbol_mode: False -> generic region coding (the reference's plain
    ``jbig2 -p``, mrc.py:502-510); True -> symbol-dictionary + text-region
    coding (jbig2enc ``-s`` analogue, but lossless: only bit-identical
    connected components share a dictionary symbol); 'auto' -> whichever
    of the two encodes smaller."""
    lib = _get_lib()
    m = np.ascontiguousarray(np.asarray(mask).astype(np.uint8))
    h, w = m.shape
    cap = w * h // 4 + 1024
    while True:
        out = np.empty(cap, np.uint8)
        if symbol_mode:
            n = lib.jbig2tpu_encode_symbol(
                m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
                1 if tpgdon else 0, 1 if embedded else 0,
                2 if symbol_mode == 'auto' else 1,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
            if n == -1:     # degenerate (empty mask): generic fallback
                return encode_jbig2(m, embedded, tpgdon)
        else:
            n = lib.jbig2tpu_encode(
                m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
                1 if tpgdon else 0, 1 if embedded else 0,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if n >= 0:
            return out[:n].tobytes()
        cap = -n


def decode_jbig2(data, w, h):
    """Decode an embedded stream produced by encode_jbig2 -> bool (H, W)."""
    lib = _get_lib()
    buf = np.frombuffer(bytes(data), np.uint8)
    out = np.empty(h * w, np.uint8)
    rc = lib.jbig2tpu_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h)
    if rc != 0:
        raise ValueError('jbig2 decode failed')
    return out.reshape(h, w).astype(bool)


def encode_jbig2_external(png_path, embedded=True, debug=False):
    """Invoke a system jbig2enc binary exactly like the reference
    (``mrc.py:502-510``); available when byte-parity with jbig2enc is
    required and the binary exists."""
    args = ['jbig2', '-p', png_path] if embedded else ['jbig2', png_path]
    if debug:
        print('check_output: %s' % args, file=sys.stderr)
    return subprocess.check_output(args)


def external_available():
    return which('jbig2') is not None
