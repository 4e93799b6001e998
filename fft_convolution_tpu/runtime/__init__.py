"""Native host runtime bindings (ctypes).

The device runs the spectral math; this package owns the host side of the
real-time path — the C++ SPSC ring buffer, block assembler, and WAV codec in
``native/host_runtime.cpp``.  The library is built on first use with the
local toolchain (``make``/``g++``); if no toolchain is available the pure-
Python fallbacks built into :mod:`fft_convolution_tpu.runtime.chunker` are
used so the package never hard-fails.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhost_runtime.so"))

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        c = ctypes
        f32p = c.POINTER(c.c_float)
        lib.rb_create.restype = c.c_void_p
        lib.rb_create.argtypes = [c.c_uint32]
        lib.rb_destroy.argtypes = [c.c_void_p]
        lib.rb_capacity.restype = c.c_uint32
        lib.rb_capacity.argtypes = [c.c_void_p]
        lib.rb_readable.restype = c.c_uint64
        lib.rb_readable.argtypes = [c.c_void_p]
        lib.rb_writable.restype = c.c_uint64
        lib.rb_writable.argtypes = [c.c_void_p]
        lib.rb_write.restype = c.c_uint32
        lib.rb_write.argtypes = [c.c_void_p, f32p, c.c_uint32]
        lib.rb_read.restype = c.c_uint32
        lib.rb_read.argtypes = [c.c_void_p, f32p, c.c_uint32]
        lib.ba_create.restype = c.c_void_p
        lib.ba_create.argtypes = [c.c_uint32]
        lib.ba_destroy.argtypes = [c.c_void_p]
        lib.ba_fill.restype = c.c_uint32
        lib.ba_fill.argtypes = [c.c_void_p]
        lib.ba_push.restype = c.c_uint32
        lib.ba_push.argtypes = [
            c.c_void_p, f32p, c.c_uint32, f32p, c.c_uint32,
            c.POINTER(c.c_uint32),
        ]
        lib.ba_reset.argtypes = [c.c_void_p]
        lib.ba_peek.argtypes = [c.c_void_p, f32p]
        lib.wav_write_mono16.restype = c.c_int32
        lib.wav_write_mono16.argtypes = [c.c_char_p, f32p, c.c_uint64, c.c_uint32]
        lib.wav_read_mono16.restype = c.c_int64
        lib.wav_read_mono16.argtypes = [
            c.c_char_p, f32p, c.c_int64, c.POINTER(c.c_uint32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None
