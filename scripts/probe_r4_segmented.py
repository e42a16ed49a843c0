"""Chip validation of the SEGMENTED grid-join lookup (out-of-core
DBs): force a 2^27-entry table into 4 grid segments via a small
device cap, drive the real ExactLookup.values_bulk product path, and
decode-check against the sorted-array ground truth.

Usage: python scripts/probe_r4_segmented.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

os.environ["MERYL_TPU_BACJ_CAP_GB"] = "0.4"       # ~4 segments
os.environ["MERYL_TPU_LOOKUP_DEVICE_GB"] = "0.5"  # host-resident table

from meryl_tpu import kmer as km        # noqa: E402
from meryl_tpu import lookup as lk      # noqa: E402

K = 21
LOGN = 27
Q = 1 << 22


class _FakeDB:
    k = K

    def __init__(self, t):
        self._t = t

    def load_all(self):
        return self._t


def main():
    rng = np.random.default_rng(0)
    n0 = 1 << LOGN
    gaps = rng.exponential(scale=(1 << (2 * K)) / n0, size=n0)
    lo = np.floor(np.cumsum(gaps)).astype(np.uint64)
    keep = np.ones(n0, bool)
    keep[1:] = lo[1:] != lo[:-1]
    lo = lo[keep & (lo < (1 << (2 * K)))]
    hi = np.zeros(len(lo), np.uint64)
    counts = rng.integers(1, 200, size=len(lo)).astype(np.uint32)
    n = len(lo)
    print(f"N = {n}", flush=True)

    t0 = time.perf_counter()
    table = lk.ExactLookup(_FakeDB((hi, lo, counts)))
    assert not table._device_resident, "expected host-resident mode"
    table._bacj = table._build_bacj() or "degenerate"
    assert table._bacj != "degenerate"
    K_seg = table._bacj["segments"]
    cfg = table._bacj["cfg"]
    print(f"build {time.perf_counter()-t0:.1f}s; segments={K_seg} "
          f"b={cfg['b']} c={cfg['c']} mem={cfg['mem']/1e9:.2f}GB "
          f"(cap 0.4GB/segment)", flush=True)
    assert K_seg >= 2, "cap should force segmentation"

    half = Q // 2
    take = rng.integers(0, n, size=half)
    qlo = np.concatenate([lo[take], rng.integers(
        0, 1 << (2 * K), size=Q - half, dtype=np.uint64)])
    qlo[::37] = qlo[0]  # duplicate sprinkles
    rng.shuffle(qlo)
    qhi = np.zeros(Q, np.uint64)
    qp = km.planes_from_hilo(qhi, qlo, table.P)

    t0 = time.perf_counter()
    got = table.values_bulk([np.asarray(p) for p in qp],
                            np.ones(Q, bool))
    dt = time.perf_counter() - t0
    print(f"segmented values_bulk: {dt:.1f}s for {Q} queries "
          f"({Q/dt/1e6:.1f} Mq/s wall incl. segment uploads)",
          flush=True)

    idx = np.searchsorted(lo, qlo)
    ok = idx < n
    ii = np.minimum(idx, n - 1)
    ok &= lo[ii] == qlo
    want = np.where(ok, counts[ii], 0).astype(np.uint32)
    bad = int((got != want).sum())
    print(f"mismatches: {bad} / {Q}", flush=True)
    assert bad == 0
    print("SEGMENTED LOOKUP EXACT ON CHIP", flush=True)


if __name__ == "__main__":
    main()
