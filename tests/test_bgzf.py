"""Parallel BGZF reader: real blocked-gzip members (BC extra field)
decode identically to the stdlib path, with block-boundary stress."""

import gzip
import struct
import zlib

import numpy as np
import pytest

from meryl_tpu.io import bgzf

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def _bgzf_member(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = co.compress(payload) + co.flush()
    bsize = 12 + 6 + len(cdata) + 8  # hdr + xtra + cdata + trailer
    hdr = (b"\x1f\x8b\x08\x04" + b"\x00" * 4 + b"\x00\xff"
           + struct.pack("<H", 6)
           + b"BC" + struct.pack("<H", 2) + struct.pack("<H", bsize - 1))
    return hdr + cdata + struct.pack("<I", zlib.crc32(payload)) + \
        struct.pack("<I", len(payload) & 0xFFFFFFFF)


def _write_bgzf(path, data: bytes, block=57000):
    with open(path, "wb") as f:
        for i in range(0, len(data), block):
            f.write(_bgzf_member(data[i:i + block]))
        f.write(BGZF_EOF)


def test_detect_and_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, size=1 << 20).astype(np.uint8).tobytes()
    p = str(tmp_path / "x.bgzf")
    _write_bgzf(p, data)
    assert bgzf.is_bgzf(p)
    with bgzf.open_bam_stream(p) as f:
        got = bytearray()
        while True:  # odd read sizes straddle member boundaries
            chunk = f.read(12345)
            if not chunk:
                break
            got += chunk
    assert bytes(got) == data
    # stdlib gzip agrees (BGZF is valid multi-member gzip)
    assert gzip.open(p, "rb").read() == data


def test_plain_gzip_fallback(tmp_path):
    p = str(tmp_path / "p.gz")
    with gzip.open(p, "wb") as f:
        f.write(b"hello world" * 1000)
    assert not bgzf.is_bgzf(p)
    with bgzf.open_bam_stream(p) as f:
        assert f.read(11) == b"hello world"


def test_bam_over_real_bgzf(tmp_path):
    """A BAM whose container is genuine BGZF streams through both the
    record iterator and the bulk counting decoder."""
    import random

    from meryl_tpu.io import bam
    from tests.test_bam import _make_bam

    random.seed(9)
    reads = [(f"r{i}", "".join(random.choices("ACGT", k=151)), None)
             for i in range(2000)]
    plain = str(tmp_path / "plain.bam")
    _make_bam(plain, reads)
    raw = gzip.open(plain, "rb").read()
    p = str(tmp_path / "real.bam")
    _write_bgzf(p, raw)
    assert bam.is_bam(p) and bgzf.is_bgzf(p)
    got = [(n, s.decode()) for n, s, _ in bam.iter_bam(p)]
    assert got == [(n, s) for n, s, _ in reads]
    codes = np.concatenate(list(bam.iter_codes(p)))
    want = np.concatenate(list(bam.iter_codes(plain)))
    assert np.array_equal(codes, want)


def test_truncated_member_stops_cleanly(tmp_path):
    data = b"A" * 100000
    p = str(tmp_path / "t.bgzf")
    full = _bgzf_member(data)
    with open(p, "wb") as f:
        f.write(full)
        f.write(_bgzf_member(data)[: 30])  # truncated second member
    with bgzf.open_bam_stream(p) as f:
        assert f.read(len(data)) == data
        assert f.read(10) == b""


def test_extra_subfield_before_bc(tmp_path):
    """BGZF only requires the BC subfield to be PRESENT; members with
    other extra subfields first must still stream (regression: the
    reader required BC at offset 12 and rejected the member)."""
    payload = b"N" * 70000  # two members via block split
    members = bytearray()
    for i in range(0, len(payload), 40000):
        chunk = payload[i:i + 40000]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        dummy = b"XY" + struct.pack("<H", 3) + b"abc"   # 7 bytes
        bc = b"BC" + struct.pack("<H", 2)
        xlen = len(dummy) + len(bc) + 2
        bsize = 12 + xlen + len(cdata) + 8
        hdr = (b"\x1f\x8b\x08\x04" + b"\x00" * 4 + b"\x00\xff"
               + struct.pack("<H", xlen) + dummy + bc
               + struct.pack("<H", bsize - 1))
        members += hdr + cdata + struct.pack("<I", zlib.crc32(chunk)) \
            + struct.pack("<I", len(chunk))
    p = str(tmp_path / "x.bgzf")
    with open(p, "wb") as f:
        f.write(bytes(members))
        f.write(BGZF_EOF)
    assert bgzf.is_bgzf(p)
    with bgzf.open_bam_stream(p) as f:
        assert f.read(len(payload) + 10) == payload


def test_negative_block_size_raises(tmp_path):
    """A corrupt BAM block_size must raise, not loop forever
    (regression: the python walkers spun on pos == end)."""
    import gzip as _gzip

    from meryl_tpu import native
    from meryl_tpu.io import bam

    p = str(tmp_path / "bad.bam")
    raw = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 0) \
        + struct.pack("<i", -4) + b"\x00" * 64
    with _gzip.open(p, "wb") as f:
        f.write(raw)
    with pytest.raises(ValueError, match="malformed"):
        list(bam.iter_codes(p))
    orig = native.get_lib
    native.get_lib = lambda: None
    try:
        with pytest.raises(ValueError, match="malformed"):
            list(bam.iter_codes(p))
        with pytest.raises(ValueError, match="malformed"):
            list(bam.iter_bam(p))
    finally:
        native.get_lib = orig


def test_bgzipped_fastq_counting_path(tmp_path):
    """bgzipped FASTA/FASTQ (bgzip output is valid gzip AND BGZF)
    streams through the parallel reader with identical parses and
    identical counts."""
    import random

    from meryl_tpu.counter import count_to_arrays
    from meryl_tpu.io.sequence import iter_sequences, \
        open_maybe_compressed

    random.seed(21)
    reads = [(f"r{i}", "".join(random.choices("ACGT", k=133)))
             for i in range(300)]
    fq = "".join(f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads)
    plain = tmp_path / "r.fq"
    plain.write_text(fq)
    bg = str(tmp_path / "r.fq.gz")
    _write_bgzf(bg, fq.encode(), block=2048)
    with open_maybe_compressed(bg) as f:
        assert f.readline() == f"@{reads[0][0]}\n".encode()
        assert f.read().endswith(b"I\n")
    got = [(n, s.decode()) for n, s, _ in iter_sequences(bg)]
    assert got == reads
    a = count_to_arrays([bg], 21)
    b = count_to_arrays([str(plain)], 21)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
