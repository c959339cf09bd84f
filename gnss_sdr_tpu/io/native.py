"""ctypes bindings for the native host-ingest runtime (native/ingest.cpp).

Capability parity with the reference's native layer (bindgen-bound
librtlsdr + SoapySDR FFI and the reader-thread/ring pipeline,
reference: src/rtlsdr_wrapper.rs, src/sdr_store/sdr_thread.rs,
src/rf/samples_buffer.rs). Auto-builds with ``make`` on first use if
the shared library is absent; every entry point has a NumPy fallback so
the framework works without a compiler.
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
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgnss_ingest.so")

_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            capture_output=True, check=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.convert_int8_real.argtypes = [u8p, f32p, f32p, ctypes.c_size_t]
    lib.convert_int8_iq.argtypes = [u8p, f32p, f32p, ctypes.c_size_t]
    lib.convert_uint8_iq.argtypes = [u8p, f32p, f32p, ctypes.c_size_t]
    lib.convert_int16_iq.argtypes = [
        ctypes.POINTER(ctypes.c_int16), f32p, f32p, ctypes.c_size_t
    ]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_size_t]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ring_available.restype = ctypes.c_size_t
    lib.ring_available.argtypes = [ctypes.c_void_p]
    lib.ring_capacity.restype = ctypes.c_size_t
    lib.ring_capacity.argtypes = [ctypes.c_void_p]
    lib.ring_eos.restype = ctypes.c_int
    lib.ring_eos.argtypes = [ctypes.c_void_p]
    lib.ring_set_eos.argtypes = [ctypes.c_void_p]
    lib.ring_push.restype = ctypes.c_size_t
    lib.ring_push.argtypes = [ctypes.c_void_p, u8p, ctypes.c_size_t]
    lib.ring_pop.restype = ctypes.c_size_t
    lib.ring_pop.argtypes = [ctypes.c_void_p, u8p, ctypes.c_size_t]
    lib.reader_start.restype = ctypes.c_void_p
    lib.reader_start.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_size_t
    ]
    lib.reader_stop.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def convert(raw: np.ndarray, wire_format: str) -> np.ndarray:
    """Wire bytes -> complex64 via the native kernels (NumPy fallback)."""
    lib = load_library()
    if wire_format not in _BYTES_PER_SAMPLE:
        raise ValueError(f"unknown wire format {wire_format!r}")
    # count samples by BYTES — callers may pass uint8 wire buffers or
    # already-typed arrays
    raw_bytes = np.ascontiguousarray(raw).view(np.uint8).reshape(-1)
    n = raw_bytes.size // _BYTES_PER_SAMPLE[wire_format]
    raw_bytes = raw_bytes[: n * _BYTES_PER_SAMPLE[wire_format]]

    if lib is None:
        if wire_format == "int8_real":
            return raw_bytes.view(np.int8).astype(np.float32).astype(np.complex64)
        if wire_format == "int8_iq":
            f = raw_bytes.view(np.int8).astype(np.float32)
            return (f[0::2] + 1j * f[1::2]).astype(np.complex64)
        if wire_format == "uint8_iq":
            f = raw_bytes.astype(np.float32) - 127.5
            return (f[0::2] + 1j * f[1::2]).astype(np.complex64)
        f = raw_bytes.view(np.int16).astype(np.float32)
        return (f[0::2] + 1j * f[1::2]).astype(np.complex64)

    re = np.empty(n, np.float32)
    im = np.empty(n, np.float32)
    c_f = ctypes.c_float
    if wire_format == "int8_real":
        lib.convert_int8_real(
            _ptr(raw_bytes, ctypes.c_uint8), _ptr(re, c_f), _ptr(im, c_f), n,
        )
    elif wire_format == "int8_iq":
        lib.convert_int8_iq(
            _ptr(raw_bytes, ctypes.c_uint8), _ptr(re, c_f), _ptr(im, c_f), n,
        )
    elif wire_format == "uint8_iq":
        lib.convert_uint8_iq(
            _ptr(raw_bytes, ctypes.c_uint8), _ptr(re, c_f), _ptr(im, c_f), n,
        )
    else:
        lib.convert_int16_iq(
            _ptr(raw_bytes.view(np.int16), ctypes.c_int16),
            _ptr(re, c_f), _ptr(im, c_f), n,
        )
    return (re + 1j * im).astype(np.complex64)


_BYTES_PER_SAMPLE = {
    "int8_real": 1, "int8_iq": 2, "uint8_iq": 2, "int16_iq": 4,
}


class NativeFileSource:
    """SampleSource backed by the native reader thread + SPSC ring.

    The reference architecture (sdr_thread pumping a ring while
    downstream consumes, main.rs:186-191) with the reader in C++: the
    file/FIFO is drained on a background thread so Python block pulls
    never stall on IO.
    """

    def __init__(
        self,
        path: str,
        fs_hz: float,
        wire_format: str = "int8_real",
        ring_bytes: int = 1 << 24,
    ):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native ingest library unavailable")
        self._lib = lib
        self.fs_hz = fs_hz
        self.format = wire_format
        self._bps = _BYTES_PER_SAMPLE[wire_format]
        self._ring = None
        self._reader = None
        ring = lib.ring_create(ring_bytes)
        reader = lib.reader_start(path.encode(), ring, 1 << 18)
        if not reader:
            lib.ring_destroy(ring)
            raise FileNotFoundError(path)
        self._ring = ring
        self._reader = reader

    def read(self, n: int) -> Optional[np.ndarray]:
        import time

        want = n * self._bps
        buf = np.empty(want, np.uint8)
        got = 0
        while got < want:
            chunk = self._lib.ring_pop(
                self._ring,
                buf[got:].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                want - got,
            )
            got += chunk
            if chunk == 0:
                if self._lib.ring_eos(self._ring):
                    break
                time.sleep(0.001)
        if got == 0:
            return None
        usable = (got // self._bps) * self._bps
        return convert(buf[:usable], self.format)

    def close(self):
        if self._reader:
            self._lib.reader_stop(self._reader)
            self._reader = None
        if self._ring:
            self._lib.ring_destroy(self._ring)
            self._ring = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
