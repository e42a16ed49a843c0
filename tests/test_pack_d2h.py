"""Packed accumulator download (ops/accum.pack_for_download +
DeviceAccCounter._download_packed): the gap+count wire packing that
cuts the finalize d2h transfer ~3x, with its exactness hatches.

The broad differentials (test_device_acc.py) run through this path by
default; these tests force the packed path's own corners: count
exceptions (hot kmers past the count field), gap exceptions, the
EXC_ROW_CAP overflow -> dense fallback, and knob-off equality.
"""

import numpy as np
import pytest

from meryl_tpu import counter as ctr
from meryl_tpu.ops import accum


def _mk_counter(k=21, chunk=1 << 12, exp=1 << 12):
    return ctr.DeviceAccCounter(k, "forward", chunk, exp)


def _feed(c, codes):
    """Chunk-wise feed WITHOUT halo (the production halo lives in
    SequenceChunker): the brute model below counts per chunk too."""
    for s in range(0, len(codes), c.chunk_len):
        c.add_codes(codes[s:s + c.chunk_len])


def _brute(codes, k, chunk_len):
    counts = {}
    mask = (1 << (2 * k)) - 1
    for s in range(0, len(codes), chunk_len):
        run = 0
        v = 0
        for x in codes[s:s + chunk_len]:
            if x > 3:
                run, v = 0, 0
                continue
            v = ((v << 2) | int(x)) & mask
            run += 1
            if run >= k:
                counts[v] = counts.get(v, 0) + 1
    return counts


def _check(c, codes, k):
    hi, lo, cts = c.finalize()
    want = _brute(codes, k, c.chunk_len)
    got = {(int(h) << 64) | int(v): int(n)
           for h, v, n in zip(hi.tolist(), lo.tolist(), cts.tolist())}
    assert got == want


def test_packed_path_engages_and_matches():
    """Dense keyspace occupancy (k=10: ~16K uniques over 2^20 keys,
    gaps fit the field): the packed download runs (not the fallback)
    and decodes exactly.  At k=21 the same input would be gap-sparse
    and legitimately fall back dense — covered by test_knob_off."""
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=1 << 14).astype(np.uint8)
    c = _mk_counter(k=10)
    _feed(c, codes)
    # spy on the packed path to assert it actually engaged
    engaged = []
    orig = ctr.DeviceAccCounter._download_packed

    def spy(self, lmax):
        out = orig(self, lmax)
        engaged.append(out is not None)
        return out

    ctr.DeviceAccCounter._download_packed = spy
    try:
        _check(c, codes, 10)
    finally:
        ctr.DeviceAccCounter._download_packed = orig
    assert engaged == [True]


def test_hot_count_exceptions():
    """A few kmers repeated far past the count field ride the
    exception arrays and decode exactly."""
    rng = np.random.default_rng(1)
    base = rng.integers(0, 4, size=1 << 13).astype(np.uint8)
    hot = np.tile(base[:21], 400)  # one kmer ~400x + rotations
    codes = np.concatenate([base, hot, base[::-1]])
    c = _mk_counter()
    _feed(c, codes)
    _check(c, codes, 21)


def test_knob_off_matches(monkeypatch):
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=1 << 14).astype(np.uint8)
    c1 = _mk_counter()
    _feed(c1, codes)
    r1 = c1.finalize()
    monkeypatch.setenv("MERYL_TPU_PACK_D2H", "0")
    c2 = _mk_counter()
    _feed(c2, codes)
    r2 = c2.finalize()
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a, b)


def test_exc_cap_overflow_falls_back_dense(monkeypatch):
    """Blowing EXC_ROW_CAP must return None (dense fallback), never a
    wrong decode."""
    monkeypatch.setattr(accum, "EXC_ROW_CAP", 1)
    rng = np.random.default_rng(3)
    # many hot kmers -> many count exceptions per row once the count
    # field is small; with cap 1 the packed path must bow out
    parts = []
    for i in range(40):
        km = rng.integers(0, 4, size=21).astype(np.uint8)
        parts.append(np.tile(km, 300))
        parts.append(np.array([9], np.uint8))  # breaker
    codes = np.concatenate(parts)
    c = _mk_counter()
    _feed(c, codes)
    _check(c, codes, 21)


def test_k32_boundary_uses_packed():
    """2k = 64 is the widest packable key (single u64 host cumsum)."""
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, size=1 << 14).astype(np.uint8)
    c = _mk_counter(k=32)
    _feed(c, codes)
    _check(c, codes, 32)


def test_k33_gated_to_dense():
    """k > 32 cannot pack (128-bit host cumsum) — exactness via the
    dense download."""
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=1 << 13).astype(np.uint8)
    c = _mk_counter(k=33)
    _feed(c, codes)
    _check(c, codes, 33)


def test_pack_kernel_roundtrip_direct():
    """Kernel-level differential: random sorted accumulator rows pack
    and reconstruct exactly (incl. row-0 base, empty rows, per-row
    gap-field widths, exceptions by gap and by count)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    B, La, P, k = 8, 256, 2, 21
    cbits_min = 10
    span = (1 << (2 * k)) // B
    planes0 = np.full((B, La), 0xFFFFFFFF, np.uint32)
    planes1 = np.full((B, La), 0xFFFFFFFF, np.uint32)
    counts = np.zeros((B, La), np.uint32)
    want = []
    for r in range(B):
        if r == 3:
            continue  # empty row
        n = int(rng.integers(5, La))
        # row 5 is dense (tiny gaps -> narrow field), row 6 sparse
        hi_g = 1 << (10 if r == 5 else 18)
        gaps = rng.integers(1, hi_g, size=n).astype(np.uint64)
        if r != 5:  # row 5 stays narrow: its field must track density
            gaps[n // 2] = np.uint64(1) << np.uint64(25)  # gap exc
        keys = np.cumsum(gaps) + r * span
        cts = rng.integers(1, 1 << 9, size=n).astype(np.uint32)
        if n > 2:
            cts[1] = np.uint32((1 << 31) + 7)  # count exception
        planes0[r, :n] = keys & 0xFFFFFFFF
        planes1[r, :n] = keys >> 32
        counts[r, :n] = cts
        want += [(int(a), int(b)) for a, b in zip(keys, cts)]

    packed, gbits_row, exc_col, exc_planes, exc_cnt, n_exc = \
        accum.pack_for_download(
            (jnp.asarray(planes0), jnp.asarray(planes1)),
            jnp.asarray(counts), P, cbits_min)
    packed = np.asarray(packed)
    gbits_row = np.asarray(gbits_row)
    exc_col = np.asarray(exc_col)
    exc_p = [np.asarray(p).astype(np.uint64) for p in exc_planes]
    exc_cnt = np.asarray(exc_cnt)
    n_exc = np.asarray(n_exc)
    assert n_exc.max() <= accum.EXC_ROW_CAP
    assert (n_exc[np.array([0, 1, 2, 4, 5, 6, 7])] >= 1).all()
    assert gbits_row[5] < gbits_row[6]  # field tracks row density
    assert (gbits_row <= 32 - cbits_min).all()

    # host reconstruction (mirrors counter._download_packed)
    lo0 = planes0[:, 0].astype(np.uint64) \
        | (planes1[:, 0].astype(np.uint64) << np.uint64(32))
    cbits_row = (32 - gbits_row).astype(np.uint32)
    gaps = (packed >> cbits_row[:, None]).astype(np.uint64)
    cts = (packed & ((np.uint32(1) << cbits_row[:, None])
                     - np.uint32(1))).astype(np.uint32)
    is_exc = packed == 0xFFFFFFFF
    gaps[is_exc] = 0
    keys = gaps
    keys[:, 0] = lo0
    np.cumsum(keys, axis=1, out=keys)
    for r in np.flatnonzero(n_exc):
        for j in range(int(n_exc[r])):
            cc = int(exc_col[r, j])
            t = exc_p[0][r, j] | (exc_p[1][r, j] << np.uint64(32))
            keys[r, cc:] += t - keys[r, cc]
            cts[r, cc] = exc_cnt[r, j]
    m = packed != 0
    m[:, 0] = counts[:, 0] > 0
    cts[:, 0] = counts[:, 0]
    got = list(zip(keys[m].tolist(), cts[m].tolist()))
    assert got == want
