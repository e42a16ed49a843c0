"""Segmented grid-join lookup (out-of-core DBs past the device
budget) and the host-resident table mode, against a dict oracle.

The product gates: tables past MERYL_TPU_LOOKUP_DEVICE_GB stay host-
resident (bulk -> segmented BACJ streamed through HBM, point probes ->
values_host); plan_bacjoin_segmented splits the grid into K key-range
segments when one grid exceeds MERYL_TPU_BACJ_CAP_GB.
"""

import numpy as np
import pytest

from meryl_tpu import kmer as km
from meryl_tpu import lookup as lk
from meryl_tpu.ops import bacjoin as bj


class _FakeDB:
    def __init__(self, k, hi, lo, counts):
        self.k = k
        self._t = (hi, lo, counts)

    def load_all(self):
        return self._t


def _mk(rng, n, k, device_gb=None, cap_gb=None, monkeypatch=None):
    if device_gb is not None:
        monkeypatch.setenv("MERYL_TPU_LOOKUP_DEVICE_GB",
                           str(device_gb))
    if cap_gb is not None:
        monkeypatch.setenv("MERYL_TPU_BACJ_CAP_GB", str(cap_gb))
    lo = np.unique(rng.integers(0, 1 << min(2 * k, 63), size=n,
                                dtype=np.uint64))
    hi = np.zeros(len(lo), np.uint64)
    counts = rng.integers(1, 100, size=len(lo)).astype(np.uint32)
    t = lk.ExactLookup(_FakeDB(k, hi, lo, counts))
    t.BACJ_MIN_N = 1 << 10
    t.BACJ_SLAB = 1 << 13
    t.JOIN_MIN_Q = 1 << 10
    d = {int(x): int(v) for x, v in zip(lo, counts)}
    return t, lo, d


def _query(t, qlo, exists_only=False):
    qhi = np.zeros(len(qlo), np.uint64)
    qp = km.planes_from_hilo(qhi, qlo, t.P)
    return t.values_bulk([np.asarray(p) for p in qp],
                         np.ones(len(qlo), bool),
                         exists_only=exists_only)


def test_planner_segments_when_grid_exceeds_cap():
    rng = np.random.default_rng(0)
    n = 1 << 16
    lo = np.unique(rng.integers(0, 1 << 42, size=n, dtype=np.uint64))
    hi = np.zeros(len(lo), np.uint64)
    bm = 20
    topM = bj._top_bits_np(hi, lo, 21, bm)
    cM = np.bincount(topM.astype(np.int64), minlength=1 << bm)

    def bucket_max(b):
        return int(cM.reshape(1 << b, -1).sum(axis=1).max())

    full = bj.plan_bacjoin_segmented(len(lo), 21, bucket_max, 1 << 13,
                                     10**9, b_hi=bm)
    assert full is not None and full["segments"] == 1
    seg = bj.plan_bacjoin_segmented(len(lo), 21, bucket_max, 1 << 13,
                                    full["mem"] // 3, b_hi=bm)
    assert seg is not None and seg["segments"] >= 2
    assert seg["mem"] <= (full["mem"] // 3) * seg["segments"]
    assert (1 << seg["b1"]) % seg["segments"] == 0


def test_segmented_bulk_matches_dict(monkeypatch):
    """Force a multi-segment grid on a small table; results must match
    the dict oracle exactly across hits, misses, and duplicates."""
    rng = np.random.default_rng(1)
    k = 21
    t, lo, d = _mk(rng, 1 << 15, k, device_gb=1e-6, cap_gb=2e-4,
                   monkeypatch=monkeypatch)
    assert not t._device_resident
    t._bacj = t._build_bacj() or "degenerate"
    assert t._bacj != "degenerate"
    assert t._bacj["segments"] >= 2
    Q = (1 << 14) + 333
    take = rng.integers(0, len(lo), size=Q // 2)
    qlo = np.concatenate([
        lo[take],
        rng.integers(0, 1 << 42, size=Q - Q // 2, dtype=np.uint64)])
    qlo[::17] = qlo[0]  # duplicate flood sprinkles
    rng.shuffle(qlo)
    got = _query(t, qlo)
    want = np.array([d.get(int(x), 0) for x in qlo], np.uint32)
    np.testing.assert_array_equal(got, want)
    ex = _query(t, qlo, exists_only=True)
    np.testing.assert_array_equal(ex, (want > 0).astype(np.uint32))


def test_host_resident_point_probes(monkeypatch):
    rng = np.random.default_rng(2)
    t, lo, d = _mk(rng, 1 << 12, 21, device_gb=1e-6,
                   monkeypatch=monkeypatch)
    assert not t._device_resident
    qlo = np.concatenate([lo[:100], np.array([1, 2, 3], np.uint64)])
    got = t.values_np(np.zeros(len(qlo), np.uint64), qlo)
    want = np.array([d.get(int(x), 0) for x in qlo], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_host_resident_wide_keys(monkeypatch):
    """k > 32 (hi plane in play): values_host two-stage search."""
    rng = np.random.default_rng(3)
    k = 40
    n = 1 << 12
    lo = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    hi = rng.integers(0, 1 << (2 * k - 64), size=n, dtype=np.uint64)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    keep = np.ones(n, bool)
    keep[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    hi, lo = hi[keep], lo[keep]
    counts = rng.integers(1, 100, size=len(lo)).astype(np.uint32)
    monkeypatch.setenv("MERYL_TPU_LOOKUP_DEVICE_GB", "1e-6")
    t = lk.ExactLookup(_FakeDB(k, hi, lo, counts))
    assert not t._device_resident
    d = {(int(h) << 64) | int(x): int(v)
         for h, x, v in zip(hi, lo, counts)}
    qh = np.concatenate([hi[:50], rng.integers(
        0, 1 << (2 * k - 64), size=50, dtype=np.uint64)])
    ql = np.concatenate([lo[:50], rng.integers(
        0, 1 << 63, size=50, dtype=np.uint64)])
    got = t.values_host(qh, ql)
    want = np.array([d.get((int(a) << 64) | int(b), 0)
                     for a, b in zip(qh, ql)], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_segmented_exceptions_route_to_host_search(monkeypatch):
    """Duplicate-flooded slabs overflow cells; in host-resident mode
    the exact fallback is values_host, still correct."""
    rng = np.random.default_rng(4)
    k = 21
    t, lo, d = _mk(rng, 1 << 14, k, device_gb=1e-6, cap_gb=1e-4,
                   monkeypatch=monkeypatch)
    hot = lo[7]
    qlo = np.full(1 << 13, hot, np.uint64)  # one kmer flooded
    qlo[1::3] = lo[rng.integers(0, len(lo), size=len(qlo[1::3]))]
    got = _query(t, qlo)
    want = np.array([d.get(int(x), 0) for x in qlo], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_segmented_numpy_router_fallback(monkeypatch):
    """The numpy reference router must handle segment row windows
    identically to the native one (MERYL_TPU_NATIVE_ROUTE=0)."""
    monkeypatch.setenv("MERYL_TPU_NATIVE_ROUTE", "0")
    rng = np.random.default_rng(6)
    k = 21
    t, lo, d = _mk(rng, 1 << 15, k, device_gb=1e-6, cap_gb=2e-4,
                   monkeypatch=monkeypatch)
    t._bacj = t._build_bacj() or "degenerate"
    assert t._bacj != "degenerate" and t._bacj["segments"] >= 2
    Q = 1 << 13
    take = rng.integers(0, len(lo), size=Q // 2)
    qlo = np.concatenate([
        lo[take],
        rng.integers(0, 1 << 42, size=Q - Q // 2, dtype=np.uint64)])
    got = _query(t, qlo)
    want = np.array([d.get(int(x), 0) for x in qlo], np.uint32)
    np.testing.assert_array_equal(got, want)
    ex = _query(t, qlo, exists_only=True)
    np.testing.assert_array_equal(ex, (want > 0).astype(np.uint32))


def test_router_window_violation_raises(monkeypatch):
    """A query routed outside its segment window is a caller bug and
    must raise, not silently corrupt (both router implementations)."""
    from meryl_tpu.ops import bacjoin as bj

    cfg = {"b1": 10, "capA": 64}
    lo = np.array([0, 1 << 41], np.uint64)  # spans both halves
    hi = np.zeros(2, np.uint64)
    for env in ("1", "0"):
        monkeypatch.setenv("MERYL_TPU_NATIVE_ROUTE", env)
        with pytest.raises(ValueError):
            bj.route_queries_host(hi, lo, 21, cfg, row_base=0,
                                  n_rows=512)
