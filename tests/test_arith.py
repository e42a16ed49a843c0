"""Adaptive arithmetic coder (CRAM 3.1 method 6): round-trip matrix
plus range-coder/model invariants (carry propagation, rescale)."""

import random

import pytest

from meryl_tpu.io import arith as A
from meryl_tpu.io import rans_nx16 as R


def _data(name):
    rng = random.Random(77)
    return {
        "dna": bytes(rng.choices(b"ACGT", k=4000)),
        "skew": bytes(rng.choices(b"AB", weights=[49, 1], k=6000)),
        "wide": bytes(rng.choices(range(256), k=3000)),
        "runs": (b"G" * 700 + bytes(rng.choices(b"ACGTN", k=800))
                 + b"T" * 300 + b"\x00" * 90),
        "tiny": b"CAT",
        "hi255": bytes([255, 0, 255, 255, 7] * 200),
    }[name]


FLAGSETS = [0, A.ORDER1, R.RLE, A.ORDER1 | R.RLE, A.CAT, A.EXT,
            R.PACK, R.PACK | A.ORDER1, R.STRIPE, R.STRIPE | A.ORDER1,
            R.NOSZ, A.ORDER1 | R.NOSZ, R.PACK | R.RLE | A.ORDER1]


@pytest.mark.parametrize("name", ["dna", "skew", "wide", "runs",
                                  "tiny", "hi255"])
def test_roundtrip_matrix(name):
    data = _data(name)
    for flags in FLAGSETS:
        if flags & R.PACK and len(set(data)) > 16:
            continue
        enc = A.encode(data, flags)
        hint = len(data) if flags & R.NOSZ else None
        assert A.decode(enc, hint) == data, (name, hex(flags))


def test_long_carry_chains():
    """Inputs engineered to hit the 0xFF cache-run path in the
    range coder (many max-probability symbols in a row)."""
    for pattern in (b"\x00" * 5000, b"\xff" * 5000,
                    b"\x00" * 2000 + b"\x01" + b"\x00" * 2000):
        enc = A.encode(pattern, 0)
        assert A.decode(enc) == pattern
        enc = A.encode(pattern, A.ORDER1)
        assert A.decode(enc) == pattern


def test_model_rescale():
    """Enough symbols to push a model total past 2^16 (forces the
    halving rescale on both sides identically)."""
    rng = random.Random(3)
    data = bytes(rng.choices(b"AC", weights=[3, 1], k=40000))
    enc = A.encode(data, 0)
    assert A.decode(enc) == data


def test_compression_is_real():
    rng = random.Random(9)
    dna = bytes(rng.choices(b"ACGT", k=8000))
    assert len(A.encode(dna, 0)) < len(dna) * 0.35      # ~2 bits/sym
    skew = bytes(rng.choices(b"AB", weights=[99, 1], k=8000))
    assert len(A.encode(skew, 0)) < len(skew) * 0.15


def test_truncated_raises():
    enc = A.encode(_data("dna"), 0)
    with pytest.raises((A.ArithError, IndexError)):
        A.decode(enc[: len(enc) // 3])


def test_native_arith_matches_python(monkeypatch):
    """The C arith core must agree byte-for-byte with the Python
    reference decoder (which remains the fallback)."""
    import random

    from meryl_tpu import native
    from meryl_tpu.io import arith as A

    if not (native.available()
            and hasattr(native.get_lib(), "mt_arith_decode")):
        pytest.skip("native arith core unavailable")
    rng = random.Random(9)
    for n in (1, 17, 3000, 40000):
        d = bytes(rng.choices(range(33, 74), k=n))
        r = bytes(rng.choices(b"AAAAABBC", k=n))     # runs for RLE
        for flags, data in [(0, d), (A.ORDER1, d), (0x40, r),
                            (A.ORDER1 | 0x40, r)]:
            enc = A.encode(data, flags)
            got_native = A.decode(enc, n)
            monkeypatch.setattr(native, "arith_core",
                                lambda *a, **k: None)
            got_python = A.decode(enc, n)
            monkeypatch.undo()
            assert got_native == got_python == data, (flags, n)
