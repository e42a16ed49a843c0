"""ctypes bindings for the native host substrate (native/mt_host.cpp).

The shared library is built on demand with `make -C native` (g++).  If
the toolchain or library is unavailable, callers fall back to the pure
python/numpy paths — capability is identical, the native scanner is a
host-throughput optimization (the reference's equivalent layer is the
C++ dnaSeqFile; /root/repo/SURVEY.md §2.3).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmeryl_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _MtScanner(ctypes.Structure):
    _fields_ = [
        ("fmt", ctypes.c_int32),
        ("state", ctypes.c_int32),
        ("seqlen", ctypes.c_int64),
        ("quallen", ctypes.c_int64),
        ("last_base", ctypes.c_uint8),
        ("emitted", ctypes.c_uint8),
        ("hpc", ctypes.c_uint8),
        ("bol", ctypes.c_uint8),
    ]


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MERYL_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mt_scanner_init.argtypes = [ctypes.POINTER(_MtScanner),
                                            ctypes.c_int32]
            lib.mt_scan.argtypes = [ctypes.POINTER(_MtScanner),
                                    ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_uint8)]
            lib.mt_scan.restype = ctypes.c_int64
            lib.mt_scanner_finish.argtypes = [ctypes.POINTER(_MtScanner),
                                              ctypes.POINTER(ctypes.c_uint8)]
            lib.mt_scanner_finish.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


class NativeScanner:
    """Streaming FASTA/FASTQ -> 2-bit-code scanner over raw byte blocks."""

    def __init__(self, hpc: bool = False):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._st = _MtScanner()
        lib.mt_scanner_init(ctypes.byref(self._st), 1 if hpc else 0)

    def scan(self, data: bytes) -> np.ndarray:
        n = len(data)
        out = np.empty(n + 1, np.uint8)
        optr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        wrote = self._lib.mt_scan(ctypes.byref(self._st), data, n, optr)
        return out[:wrote]

    def finish(self) -> np.ndarray:
        out = np.empty(1, np.uint8)
        optr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        wrote = self._lib.mt_scanner_finish(ctypes.byref(self._st), optr)
        return out[:wrote]


def scan_codes(path: str, hpc: bool = False, block: int = 1 << 22):
    """Yield uint8 code arrays (with 0xFF separators) for a sequence
    file, using the native scanner.  Transparently decompresses."""
    from .io.sequence import open_maybe_compressed
    sc = NativeScanner(hpc)
    with open_maybe_compressed(path) as f:
        while True:
            data = f.read(block)
            if not data:
                break
            codes = sc.scan(data)
            if len(codes):
                yield codes
    tail = sc.finish()
    if len(tail):
        yield tail
