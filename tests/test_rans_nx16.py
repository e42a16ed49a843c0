"""rANS-Nx16 (CRAM 3.1 method 5) codec: encoder/decoder round-trip
across the full flag matrix, plus hand-built streams exercising the
wire primitives (uint7, alphabet RLE, pack nibbles, RLE meta)."""

import random

import pytest

from meryl_tpu.io import rans_nx16 as R


DATASETS = {}


def _data(name):
    if not DATASETS:
        rng = random.Random(123)
        DATASETS.update({
            "dna": bytes(rng.choices(b"ACGT", k=6000)),
            "skew": bytes(rng.choices(b"AB", weights=[19, 1], k=5000)),
            "wide": bytes(rng.choices(range(256), k=4000)),
            "runs": (b"A" * 500 + b"C" * 3 +
                     bytes(rng.choices(b"ACGTN", k=1500)) + b"T" * 200),
            "tiny": b"GATTACA",
            "one": b"Z" * 900,
        })
    return DATASETS[name]


FLAGSETS = [0, R.ORDER1, R.X32, R.ORDER1 | R.X32, R.CAT, R.RLE,
            R.PACK, R.PACK | R.RLE, R.PACK | R.ORDER1,
            R.RLE | R.ORDER1 | R.X32, R.STRIPE, R.STRIPE | R.ORDER1,
            R.NOSZ, R.ORDER1 | R.NOSZ, R.PACK | R.RLE | R.ORDER1 | R.X32]


@pytest.mark.parametrize("name", ["dna", "skew", "wide", "runs",
                                  "tiny", "one"])
def test_roundtrip_matrix(name):
    data = _data(name)
    for flags in FLAGSETS:
        if flags & R.ORDER1 and len(data) < 32:
            continue
        if flags & R.PACK and len(set(data)) > 16:
            continue
        enc = R.encode(data, flags)
        hint = len(data) if flags & R.NOSZ else None
        assert R.decode(enc, hint) == data, (name, hex(flags))


def test_compressed_metas():
    data = _data("runs")
    enc = R.encode(data, R.RLE, compress_rle_meta=True)
    assert R.decode(enc) == data
    enc = R.encode(data, R.ORDER1, compress_o1_table=True)
    assert R.decode(enc) == data
    enc = R.encode(data, R.STRIPE, stripe_n=7)
    assert R.decode(enc) == data


def test_uint7_wire_format():
    # big-endian 7-bit groups, 0x80 continuation on non-final bytes
    assert R._put_uint7(0) == b"\x00"
    assert R._put_uint7(127) == b"\x7f"
    assert R._put_uint7(128) == b"\x81\x00"
    assert R._put_uint7(300) == b"\x82\x2c"
    for v in (0, 1, 127, 128, 300, 1 << 20, (1 << 28) - 5):
        cur = R._Cur(R._put_uint7(v))
        assert cur.uint7() == v


def test_alphabet_wire_format():
    # {0}: "0" then terminator 0
    assert R._write_alphabet([0]) == b"\x00\x00"
    # consecutive run 65..68: 65, then 66 with count 2, terminator
    enc = R._write_alphabet([65, 66, 67, 68])
    assert enc == bytes([65, 66, 2, 0])
    for syms in ([0], [0, 1], [65, 66, 67, 68], [3, 7, 8, 9, 200],
                 list(range(256))):
        cur = R._Cur(R._write_alphabet(syms))
        assert R._read_alphabet(cur) == syms, syms


def test_pack_wire_format():
    # 2 symbols -> 1 bit each, LSB first
    pmap = b"AC"
    packed = R._pack(b"ACCACAAC", pmap)
    assert packed == bytes([0b10010110])
    assert R._unpack(packed, pmap, 8) == b"ACCACAAC"
    # 16 symbols -> nibbles, low nibble first
    pmap16 = bytes(range(16))
    packed = R._pack(bytes([5, 12, 3]), pmap16)
    assert packed == bytes([0xC5, 0x03])
    assert R._unpack(packed, pmap16, 3) == bytes([5, 12, 3])


def test_rle_wire_format():
    lit, meta = R._rle_contract(b"AAAABCCD", [ord("A"), ord("C")])
    # meta: nsyms, syms, then run lengths (count-1) per occurrence
    assert meta == bytes([2, ord("A"), ord("C"), 3, 1])
    assert lit == b"ABCD"
    assert R._rle_expand(lit, meta, 8) == b"AAAABCCD"


def test_stripe_interleave():
    data = bytes(range(10))  # ulen % n != 0 exercises ragged streams
    enc = R.encode(data, R.STRIPE, stripe_n=4)
    assert R.decode(enc) == data


def test_truncated_raises():
    enc = R.encode(_data("dna"), R.ORDER1)
    with pytest.raises((R.RansError, IndexError)):
        R.decode(enc[: len(enc) // 2])


def test_native_matches_python_core(monkeypatch):
    """The C entropy cores must agree byte-for-byte with the Python
    reference decoders (which remain the fallback)."""
    from meryl_tpu import native

    if not (native.available()
            and hasattr(native.get_lib(), "mt_ransnx16_core")):
        pytest.skip("native rANS cores unavailable")
    rng = random.Random(42)
    streams = []
    for n in (1, 37, 5000):
        d = bytes(rng.choices(b"ACGTN", k=n))
        for f in (0, R.ORDER1, R.X32, R.ORDER1 | R.X32,
                  R.PACK | R.RLE | R.ORDER1):
            if f & R.ORDER1 and n < 32:
                continue
            streams.append((R.encode(d, f), d))
    streams.append((R.encode(bytes(rng.choices(b"AC", k=2000)),
                             R.ORDER1, compress_o1_table=True), None))
    for enc, want in streams:
        got_native = R.decode(enc)
        monkeypatch.setattr(native, "ransnx16_core",
                            lambda *a, **k: None)
        got_python = R.decode(enc)
        monkeypatch.undo()
        assert got_native == got_python
        if want is not None:
            assert got_native == want


def test_native_rans4x8_matches_python(monkeypatch):
    from meryl_tpu import native
    from meryl_tpu.io import cram
    from tests import cram_writer as cw

    if not (native.available()
            and hasattr(native.get_lib(), "mt_rans4x8_decode")):
        pytest.skip("native rANS cores unavailable")
    rng = random.Random(7)
    for n in (1, 100, 9999):
        d = bytes(rng.choices(b"ACGT", k=n))
        for enc in (cw.rans_encode_o0(d), cw.rans_encode_o1(d)):
            got_native = cram.rans_decode(enc)
            monkeypatch.setattr(native, "rans4x8_decode",
                                lambda *a, **k: None)
            got_python = cram.rans_decode(enc)
            monkeypatch.undo()
            assert got_native == got_python == d
