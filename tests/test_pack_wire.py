"""The 2-bit packed wire format (kmer.pack_codes_2bit +
ops/extract.extract_kmers_packed) must be extraction-equivalent to the
uint8 code path for every input shape: N bases, separators, trailing
pad runs, all-invalid, and k spanning 1..3 planes."""

import numpy as np
import pytest

import jax.numpy as jnp

from meryl_tpu import kmer as km
from meryl_tpu.ops import extract as ext


def _codes(rng, n, p_invalid=0.02):
    c = rng.integers(0, 4, size=n).astype(np.uint8)
    bad = rng.random(n) < p_invalid
    c[bad] = 255
    return c


@pytest.mark.parametrize("k", [5, 21, 33, 64])
@pytest.mark.parametrize("mode", ["canonical", "forward"])
def test_packed_equals_unpacked(k, mode):
    rng = np.random.default_rng(k)
    codes = _codes(rng, 4096)
    codes[-700:] = 255  # trailing separator run (final-chunk padding)
    planes_u, valid_u = ext.extract_kmers(jnp.asarray(codes), k, mode)
    packed2, exc, n_real = km.pack_codes_2bit(codes)
    planes_p, valid_p = ext.extract_kmers_packed(
        jnp.asarray(packed2), jnp.asarray(exc), jnp.uint32(n_real),
        k, mode)
    vu, vp = np.asarray(valid_u), np.asarray(valid_p)
    assert (vu == vp).all()
    for pu, pp in zip(planes_u, planes_p):
        pu, pp = np.asarray(pu), np.asarray(pp)
        assert (pu[vu] == pp[vu]).all()


def test_trailing_pad_costs_no_exceptions():
    codes = np.zeros(1 << 15, np.uint8)
    codes[100] = 255                      # one mid-stream separator
    codes[5000:] = 255                    # chunker final-chunk padding
    packed2, exc, n_real = km.pack_codes_2bit(codes)
    assert n_real == 5000
    assert (exc != km.EXC_PAD).sum() == 1
    assert len(exc) == max(16, (1 << 15) >> 6)  # floor signature


def test_pad_to_extends_words():
    codes = np.array([0, 1, 2, 3] * 5, np.uint8)
    packed2, exc, n_real = km.pack_codes_2bit(codes, pad_to=64)
    assert len(packed2) == 4 and n_real == 20


def test_all_invalid():
    codes = np.full(256, 255, np.uint8)
    packed2, exc, n_real = km.pack_codes_2bit(codes)
    assert n_real == 0
    planes, valid = ext.extract_kmers_packed(
        jnp.asarray(packed2), jnp.asarray(exc), jnp.uint32(n_real),
        11, "canonical")
    assert not np.asarray(valid).any()


def test_packed_count_to_arrays_matches_unpacked(tmp_path, monkeypatch):
    """Whole-pipeline differential: count with packed wire vs raw."""
    from meryl_tpu import counter
    rng = np.random.default_rng(0)
    fa = str(tmp_path / "r.fa")
    with open(fa, "w") as f:
        for i in range(8):
            s = "".join("ACTGN"[c] for c in rng.integers(0, 5, size=500))
            f.write(f">r{i}\n{s}\n")
    monkeypatch.setenv("MERYL_TPU_DEVICE_ACC", "0")
    monkeypatch.setenv("MERYL_TPU_PACK_WIRE", "1")
    got = counter.count_to_arrays([fa], 21, chunk_len=1 << 13)
    monkeypatch.setenv("MERYL_TPU_PACK_WIRE", "0")
    want = counter.count_to_arrays([fa], 21, chunk_len=1 << 13)
    for a, b in zip(got, want):
        assert (a == b).all()
