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
            u64p = ctypes.POINTER(ctypes.c_uint64)
            lib.mt_merge2.argtypes = [u64p, u64p, u64p, ctypes.c_int64,
                                      u64p, u64p, u64p, ctypes.c_int64,
                                      u64p, u64p, u64p]
            lib.mt_merge2.restype = ctypes.c_int64
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


def _u64p(a, off=0):
    return ctypes.cast(
        a.ctypes.data + 8 * off, ctypes.POINTER(ctypes.c_uint64))


def merge2(ha, la, ca, hb, lb, cb):
    """Merge two sorted unique (hi, lo, count-u64) runs, summing counts
    of equal kmers.  Returns (hi, lo, counts) numpy arrays."""
    return merge_cascade([(ha, la, ca), (hb, lb, cb)])


_merge_pool: list = []


def _pool_buffers(total: int):
    """Reuse the cascade's two buffer sets across calls: large numpy
    allocations are fresh mmaps, and first-touch page faults cost
    ~15us/page in this environment."""
    global _merge_pool
    if not _merge_pool or len(_merge_pool[0][0]) < total:
        cap = max(total, int(total * 1.5))
        _merge_pool = [[np.empty(cap, np.uint64) for _ in range(3)]
                       for _ in range(2)]
        for bufset in _merge_pool:  # pre-fault once
            for b in bufset:
                b[::512] = 0
    return _merge_pool[0], _merge_pool[1]


def merge_cascade(runs):
    """Merge any number of sorted unique (hi, lo, count-u64) runs with
    the native linear pairwise merge, ping-ponging two pooled buffer
    sets."""
    lib = get_lib()
    runs = [tuple(np.ascontiguousarray(x, np.uint64) for x in r)
            for r in runs]
    total = sum(len(r[2]) for r in runs)
    A, B = _pool_buffers(total)
    bounds = [0]
    o = 0
    for h, l, c in runs:
        n = len(c)
        A[0][o:o + n] = h
        A[1][o:o + n] = l
        A[2][o:o + n] = c
        o += n
        bounds.append(o)

    while len(bounds) > 2:
        newb = [0]
        o = 0
        i = 0
        while i + 2 < len(bounds):
            a0, a1, a2 = bounds[i], bounds[i + 1], bounds[i + 2]
            n = lib.mt_merge2(
                _u64p(A[0], a0), _u64p(A[1], a0), _u64p(A[2], a0), a1 - a0,
                _u64p(A[0], a1), _u64p(A[1], a1), _u64p(A[2], a1), a2 - a1,
                _u64p(B[0], o), _u64p(B[1], o), _u64p(B[2], o))
            o += n
            newb.append(o)
            i += 2
        if i + 1 < len(bounds):  # odd run copies through
            a0, a1 = bounds[i], bounds[i + 1]
            n = a1 - a0
            for x in range(3):
                B[x][o:o + n] = A[x][a0:a1]
            o += n
            newb.append(o)
        A, B = B, A
        bounds = newb
    n = bounds[-1]
    return A[0][:n].copy(), A[1][:n].copy(), A[2][:n].copy()


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
