"""ExactLookup big-DB grid-join path (lookup._values_bulk_bacj)
against a dict oracle, with the admission thresholds patched down so
the CPU test exercises the real product wiring: lazy build, slab loop,
per-cell overflow fallback, capture-window overflow (whole-row
fallback), router rejection (whole-slab fallback), exists mode."""

import numpy as np
import pytest

from meryl_tpu import kmer as km
from meryl_tpu import lookup as lk


class _FakeDB:
    def __init__(self, k, hi, lo, counts):
        self.k = k
        self._t = (hi, lo, counts)

    def load_all(self):
        return self._t


def _mk_table(rng, n, k):
    lo = np.unique(rng.integers(0, 1 << min(2 * k, 63), size=n,
                                dtype=np.uint64))
    hi = np.zeros(len(lo), np.uint64)
    counts = rng.integers(1, 100, size=len(lo)).astype(np.uint32)
    t = lk.ExactLookup(_FakeDB(k, hi, lo, counts))
    t.BACJ_MIN_N = 1 << 10
    t.BACJ_SLAB = 1 << 14
    t.JOIN_MIN_Q = 1 << 10
    d = {int(l): int(v) for l, v in zip(lo, counts)}
    return t, hi, lo, counts, d


def _query(t, qlo, exists_only=False):
    qhi = np.zeros(len(qlo), np.uint64)
    qp = km.planes_from_hilo(qhi, qlo, t.P)
    return t.values_bulk([np.asarray(p) for p in qp],
                         np.ones(len(qlo), bool),
                         exists_only=exists_only)


def test_bacj_product_path_matches_dict():
    rng = np.random.default_rng(11)
    k = 21
    t, hi, lo, counts, d = _mk_table(rng, 1 << 17, k)
    Q = (1 << 15) + 777          # multiple slabs + ragged tail
    take = rng.integers(0, len(lo), size=Q // 2)
    qlo = np.concatenate([
        lo[take],
        rng.integers(0, 1 << 42, size=Q - Q // 2, dtype=np.uint64),
        # ~30 duplicates of one hit: same fine bucket -> cell overflow
        # capture -> exact binary-search fallback
        np.full(30, lo[123], np.uint64)])[:Q]
    got = _query(t, qlo)
    assert isinstance(t._bacj, dict), "grid join did not engage"
    want = np.array([d.get(int(x), 0) for x in qlo], np.uint32)
    np.testing.assert_array_equal(got, want)
    # exists mode through the same path
    ex = _query(t, qlo[: 1 << 14], exists_only=True)
    np.testing.assert_array_equal(ex, (want[: 1 << 14] > 0)
                                  .astype(np.uint32))


def test_bacj_capture_window_overflow_falls_back_whole_row():
    rng = np.random.default_rng(13)
    k = 21
    t, hi, lo, counts, d = _mk_table(rng, 1 << 17, k)
    g = t._build_bacj()
    assert g is not None
    # shrink the capture window so a duplicate flood overflows it
    cfg = dict(g["cfg"], ovfcap=8)
    g2 = dict(g, cfg=cfg,
              kcfg=(k, cfg["b"], cfg["b1"], cfg["c"], cfg["capA"],
                    cfg["s_cap"], 8))
    t._bacj = g2
    Q = 1 << 12
    qlo = rng.integers(0, 1 << 42, size=Q, dtype=np.uint64)
    qlo[:40] = lo[7]             # 40 dups, c << 40, n_ovf > ovfcap=8
    got = _query(t, qlo)
    want = np.array([d.get(int(x), 0) for x in qlo], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_bacj_router_rejection_falls_back_whole_slab():
    rng = np.random.default_rng(17)
    k = 21
    t, hi, lo, counts, d = _mk_table(rng, 1 << 17, k)
    Q = 1 << 12
    qlo = np.full(Q, lo[5], np.uint64)   # one coarse row > capA
    got = _query(t, qlo)
    assert isinstance(t._bacj, dict)
    assert (got == d[int(lo[5])]).all()


def test_bacj_below_threshold_uses_routed_join():
    rng = np.random.default_rng(19)
    k = 21
    t, hi, lo, counts, d = _mk_table(rng, 1 << 14, k)
    t.BACJ_MIN_N = 1 << 30       # keep grid join out
    qlo = rng.integers(0, 1 << 42, size=1 << 12, dtype=np.uint64)
    got = _query(t, qlo)
    want = np.array([d.get(int(x), 0) for x in qlo], np.uint32)
    np.testing.assert_array_equal(got, want)
    assert t._bacj is None
