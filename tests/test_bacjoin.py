"""Differential tests for the bucket-aligned compare-join
(ops/bacjoin.py) against a dict oracle: exact values, duplicate
queries, cell overflow capture, multi-plane suffixes (large k), and
the host routing round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from meryl_tpu.ops import bacjoin as bj

SENT = 0xFFFFFFFF


def _rand_keys(rng, n, bits):
    lo = rng.integers(0, 1 << min(bits, 32), size=n, dtype=np.uint64)
    if bits > 32:
        lo |= rng.integers(0, 1 << min(bits - 32, 32),
                           size=n, dtype=np.uint64) << np.uint64(32)
    hi = np.zeros(n, np.uint64)
    if bits > 64:
        hi = rng.integers(0, 1 << (bits - 64), size=n, dtype=np.uint64)
    return hi, lo


def _mk_db(rng, n, k):
    hi, lo = _rand_keys(rng, n, 2 * k)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    uniq = np.ones(len(lo), bool)
    uniq[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    hi, lo = hi[uniq], lo[uniq]
    counts = rng.integers(1, 100, size=len(lo)).astype(np.uint32)
    return hi, lo, counts


def _run(hi, lo, counts, qhi, qlo, k, cfg):
    dbd, dbv = bj.build_db_grid(hi, lo, counts, k, cfg)
    routed = bj.route_queries_host(qhi, qlo, k, cfg)
    assert routed is not None
    qlow, n_row, perm = routed
    kcfg = (k, cfg["b"], cfg["b1"], cfg["c"], cfg["capA"],
            cfg["s_cap"], cfg["ovfcap"])
    vals, pos, ovf_pos, n_ovf = bj.bacjoin_kernel(
        tuple(jnp.asarray(d) for d in dbd), jnp.asarray(dbv),
        tuple(jnp.asarray(q) for q in qlow), jnp.asarray(n_row), kcfg)
    return (np.asarray(vals), np.asarray(pos), np.asarray(ovf_pos),
            np.asarray(n_ovf), perm, n_row)


def _decode(vals, pos, perm, capA, Q):
    out = np.full(Q, SENT, np.int64)  # SENT = unresolved
    rows, cols = np.nonzero(pos != SENT)
    orig = perm[rows * capA + pos[rows, cols]]
    out[orig] = vals[rows, cols]
    return out


def _cfg(k, b, b1, c, s_cap, capA, ovfcap=16):
    return {"b": b, "B": 1 << b, "b1": b1, "c": c, "s_cap": s_cap,
            "capA": capA, "ps": max(1, -(-(2 * k - b) // 32)),
            "ovfcap": ovfcap}


@pytest.mark.parametrize("k,b,b1", [(9, 10, 4), (21, 12, 5),
                                    (33, 10, 4), (48, 9, 4)])
def test_bacjoin_matches_dict(k, b, b1):
    rng = np.random.default_rng(3 + k)
    hi, lo, counts = _mk_db(rng, 3000, k)
    d = {(int(h) << 64) | int(l): int(v)
         for h, l, v in zip(hi, lo, counts)}
    # queries: half hits, half misses
    Q = 2048
    take = rng.integers(0, len(lo), size=Q // 2)
    mhi, mlo = _rand_keys(rng, Q // 2, 2 * k)
    qhi = np.concatenate([hi[take], mhi])
    qlo = np.concatenate([lo[take], mlo])
    top = bj._top_bits_np(hi, lo, k, b)
    s_cap = int(np.bincount(top, minlength=1 << b).max())
    cfg = _cfg(k, b, b1, 8, s_cap, capA=Q)  # capA = Q: no row overflow
    vals, pos, ovf_pos, n_ovf, perm, n_row = _run(
        hi, lo, counts, qhi, qlo, k, cfg)
    got = _decode(vals, pos, perm, cfg["capA"], Q)
    want = np.array([d.get((int(h) << 64) | int(l), 0)
                     for h, l in zip(qhi, qlo)], np.int64)
    resolved = got != SENT
    assert (got[resolved] == want[resolved]).all()
    # unresolved = captured overflow, recoverable by position
    n_unres = int((~resolved).sum())
    assert n_unres == int(n_ovf.sum())
    if n_unres:
        rows, cols = np.nonzero(ovf_pos != SENT)
        orig = perm[rows * cfg["capA"] + ovf_pos[rows, cols]]
        assert sorted(orig.tolist()) == np.flatnonzero(~resolved).tolist()


def test_bacjoin_duplicates_and_overflow():
    """Duplicate-heavy queries: each duplicate resolves independently
    in its own cell slot; beyond capacity c they are captured exactly."""
    k, b, b1, c = 9, 8, 4, 3
    rng = np.random.default_rng(7)
    hi, lo, counts = _mk_db(rng, 500, k)
    d = {int(l): int(v) for l, v in zip(lo, counts)}
    Q = 512
    qlo = np.full(Q, lo[42], np.uint64)   # all the same hit
    qhi = np.zeros(Q, np.uint64)
    top = bj._top_bits_np(hi, lo, k, b)
    s_cap = int(np.bincount(top, minlength=1 << b).max())
    cfg = _cfg(k, b, b1, c, s_cap, capA=Q, ovfcap=Q)
    vals, pos, ovf_pos, n_ovf, perm, n_row = _run(
        hi, lo, counts, qhi, qlo, k, cfg)
    got = _decode(vals, pos, perm, cfg["capA"], Q)
    resolved = got != SENT
    assert resolved.sum() == c           # exactly c cell slots
    assert (got[resolved] == d[int(lo[42])]).all()
    assert int(n_ovf.sum()) == Q - c     # the rest captured, not lost


def test_route_queries_rejects_row_overflow():
    k, b, b1 = 9, 8, 2
    qlo = np.zeros(100, np.uint64)  # all in coarse row 0
    qhi = np.zeros(100, np.uint64)
    cfg = _cfg(k, b, b1, 2, 4, capA=64)
    assert bj.route_queries_host(qhi, qlo, k, cfg) is None


def test_plan_bacjoin_geometry():
    counts26 = None

    def bucket_max(b):
        return {22: 110, 23: 64, 24: 40, 25: 26, 26: 18}.get(b, 1 << 30)

    cfg = bj.plan_bacjoin(1 << 28, 21, bucket_max, 1 << 21,
                          6 * 10**9)
    assert cfg is not None
    assert cfg["b"] >= 22 and cfg["mem"] <= 6 * 10**9
    assert cfg["b1"] < cfg["b"]
    # degenerate: one bucket holds everything at every width
    assert bj.plan_bacjoin(1 << 28, 21, lambda b: 1 << 28, 1 << 21,
                           6 * 10**9) is None


def test_native_router_matches_numpy():
    """The C++ counting-sort router must be byte-identical to the
    numpy reference (same stability, same plane layout, same perm)."""
    from meryl_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "mt_bacj_route"):
        pytest.skip("native router unavailable")
    rng = np.random.default_rng(11)
    for k, q in ((21, 5000), (33, 3000), (64, 2000), (12, 1)):
        twok = 2 * k
        hi = (rng.integers(0, 1 << 62, size=q, dtype=np.uint64)
              & np.uint64((1 << max(0, twok - 64)) - 1))
        lo = rng.integers(0, 1 << 62, size=q, dtype=np.uint64)
        if twok < 64:
            lo &= np.uint64((1 << twok) - 1)
        # duplicate-heavy tail exercises stability
        lo[q // 2:] = lo[: q - q // 2]
        hi[q // 2:] = hi[: q - q // 2]
        b1 = 10
        lam = q / (1 << b1)
        capA = int(np.ceil(lam + 6 * np.sqrt(lam) + 16))
        cfg = {"b1": b1, "capA": capA}
        got = bj._route_queries_native(hi, lo, k, cfg)
        assert got is not NotImplemented
        import os
        os.environ["MERYL_TPU_NATIVE_ROUTE"] = "0"
        try:
            want = bj.route_queries_host(hi, lo, k, cfg)
        finally:
            os.environ.pop("MERYL_TPU_NATIVE_ROUTE", None)
        if want is None:
            assert got is None
            continue
        gq, gn, gp = got
        wq, wn, wp = want
        np.testing.assert_array_equal(gn, wn)
        np.testing.assert_array_equal(gp, wp)
        assert len(gq) == len(wq)
        for a, b in zip(gq, wq):
            np.testing.assert_array_equal(a, b)


def test_native_router_overflow_contract():
    from meryl_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "mt_bacj_route"):
        pytest.skip("native router unavailable")
    lo = np.zeros(100, np.uint64)  # all one bucket -> overflow
    hi = np.zeros(100, np.uint64)
    assert bj._route_queries_native(hi, lo, 21,
                                    {"b1": 10, "capA": 8}) is None


def test_native_grid_builder_matches_numpy():
    from meryl_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "mt_bacj_build_grid"):
        pytest.skip("native grid builder unavailable")
    rng = np.random.default_rng(21)
    for k in (21, 40, 64):
        twok = 2 * k
        n = 40000
        if twok <= 64:
            lo = np.sort(np.unique(rng.integers(
                0, 1 << min(twok, 63), size=n, dtype=np.uint64)))
            hi = np.zeros(len(lo), np.uint64)
        else:
            hi = rng.integers(0, 1 << min(twok - 64, 63), size=n,
                              dtype=np.uint64)
            lo = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
            order = np.lexsort((lo, hi))
            hi, lo = hi[order], lo[order]
            keep = np.ones(n, bool)
            keep[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
            hi, lo = hi[keep], lo[keep]
        counts = rng.integers(1, 200, size=len(lo)).astype(np.uint32)
        bm = 16
        topM = bj._top_bits_np(hi, lo, k, bm)
        cM = np.bincount(topM, minlength=1 << bm)

        def bucket_max(b):
            return int(cM.reshape(1 << b, -1).sum(axis=1).max())

        cfg = bj.plan_bacjoin(len(lo), k, bucket_max, 1 << 14,
                              10**9, b_hi=bm)
        if cfg is None:
            continue
        got = bj._build_db_grid_native(hi, lo, counts, k, cfg)
        assert got is not NotImplemented
        import os
        os.environ["MERYL_TPU_NATIVE_ROUTE"] = "0"
        try:
            want = bj.build_db_grid(hi, lo, counts, k, cfg)
        finally:
            os.environ.pop("MERYL_TPU_NATIVE_ROUTE", None)
        for a, b2 in zip(got[0], want[0]):
            np.testing.assert_array_equal(a, b2)
        np.testing.assert_array_equal(got[1], want[1])
