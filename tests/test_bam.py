"""BAM ingestion tests (reader is dependency-free: gzip + struct)."""

import gzip
import struct

import numpy as np

from meryl_tpu import kmer as km, oracle
from meryl_tpu.io.bam import SEQ16, is_bam, iter_bam
from meryl_tpu.io.sequence import iter_sequences


def _make_bam(path, reads):
    """reads: list of (name, seq, qual|None)."""
    out = bytearray()
    out += b"BAM\x01"
    text = b"@HD\tVN:1.6\n"
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", 1)  # one reference
    out += struct.pack("<i", 5) + b"ref1\x00" + struct.pack("<i", 1000)
    code = {c: SEQ16.index(c.encode()[0:1][0] if isinstance(c, str) else c)
            for c in "=ACMGRSVTWYHKDBN"}
    for name, seq, qual in reads:
        nm = name.encode() + b"\x00"
        l_seq = len(seq)
        packed = bytearray((l_seq + 1) // 2)
        for i, ch in enumerate(seq):
            v = code.get(ch, 15)
            packed[i // 2] |= v << (4 if i % 2 == 0 else 0)
        q = bytes(ord(c) - 33 for c in qual) if qual else b"\xff" * l_seq
        rec = struct.pack("<iiBBHHHiiii", -1, -1, len(nm), 0, 4680, 0, 4,
                          l_seq, -1, -1, 0)
        rec += nm + bytes(packed) + q
        out += struct.pack("<i", len(rec)) + rec
    with gzip.open(path, "wb") as f:
        f.write(bytes(out))


def test_bam_roundtrip(tmp_path):
    reads = [("r1", "ACGTACGTGGTT", "IIIIIIIIIIII"),
             ("r2", "GGGCCCATTTAN", None),
             ("r3", "TTTT", "!!!!")]
    p = str(tmp_path / "t.bam")
    _make_bam(p, reads)
    assert is_bam(p)
    got = list(iter_bam(p))
    assert [g[0] for g in got] == ["r1", "r2", "r3"]
    assert [g[1].decode() for g in got] == [r[1] for r in reads]
    assert got[0][2].decode() == "IIIIIIIIIIII"
    assert got[1][2] is None


def test_bam_counting(tmp_path):
    rng = np.random.default_rng(2)
    seqs = ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=400))
            for _ in range(3)]
    p = str(tmp_path / "t.bam")
    _make_bam(p, [(f"r{i}", s, None) for i, s in enumerate(seqs)])
    # dispatched through iter_sequences
    got = [s.decode() for _, s, _ in iter_sequences(p)]
    assert got == seqs
    from meryl_tpu.counter import count_to_arrays
    hi, lo, c = count_to_arrays([p], 9, chunk_len=1 << 12)
    ohi, olo, oc = oracle.count_kmers(seqs, 9)
    assert (hi == ohi).all() and (lo == olo).all() and (c == oc).all()


def test_segment_filter(tmp_path):
    rng = np.random.default_rng(6)
    seqs = ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=300))
            for _ in range(4)]
    fa = tmp_path / "r.fa"
    fa.write_text("".join(f">q{i}\n{s}\n" for i, s in enumerate(seqs)))
    from meryl_tpu.counter import count_to_arrays, merge_runs
    # segment 1/2 counts sequences 0 and 2; 2/2 counts 1 and 3
    h1, l1, c1 = count_to_arrays([str(fa)], 9, chunk_len=1 << 11,
                                 segment=(1, 2))
    oh, ol, oc = oracle.count_kmers([seqs[0], seqs[2]], 9)
    assert (h1 == oh).all() and (l1 == ol).all() and (c1 == oc).all()
    h2, l2, c2 = count_to_arrays([str(fa)], 9, chunk_len=1 << 11,
                                 segment=(2, 2))
    # union-sum of the two segments == full count (the reference's
    # segment-then-merge pattern, SURVEY.md P6)
    merged = merge_runs([(h1, l1, c1.astype(np.uint64)),
                         (h2, l2, c2.astype(np.uint64))])
    ohA, olA, ocA = oracle.count_kmers(seqs, 9)
    assert (merged[0] == ohA).all() and (merged[2] == ocA).all()


def test_bam_multimember_bgzf(tmp_path):
    """Real BGZF files are MANY concatenated gzip members; the reader
    must span member boundaries mid-record."""

    reads = [("r%d" % i,
              "".join("ACGT"[(i + j) % 4] for j in range(60)), None)
             for i in range(50)]
    # take the raw BAM payload and re-gzip it in small pieces so gzip
    # member boundaries fall mid-record
    tmp_bam = tmp_path / "single.bam"
    _make_bam(str(tmp_bam), reads)
    payload = gzip.open(tmp_bam, "rb").read()
    p = str(tmp_path / "multi.bam")
    with open(p, "wb") as f:
        for i in range(0, len(payload), 97):  # odd size splits records
            f.write(gzip.compress(payload[i:i + 97]))
    got = list(iter_bam(p))
    assert [g[0] for g in got] == [r[0] for r in reads]
    assert [g[1].decode() for g in got] == [r[1] for r in reads]


def test_bam_qual_clamp_no_crash(tmp_path):
    """A stored quality byte > 222 (not uniform-0xFF-absent) must not
    abort ingest: Phred+33 is clamped to 255 (regression: bytes()
    raised ValueError and killed the whole file)."""
    import struct as _struct

    p = str(tmp_path / "q.bam")
    _make_bam(p, [("r1", "ACGT", "IIII")])
    # stored qualities are Phred (ord('I')-33 = 40 = '('); patch the
    # third to 0xE0 so Phred+33 would exceed 255
    raw = gzip.open(p, "rb").read()
    qpos = raw.rfind(b"((((")
    assert qpos >= 0
    raw = raw[:qpos + 2] + bytes([0xE0]) + raw[qpos + 3:]
    with gzip.open(p, "wb") as f:
        f.write(raw)
    (name, seq, qual), = list(iter_bam(p))
    assert seq == b"ACGT"
    assert qual is not None and len(qual) == 4
    assert qual[2] == 255  # clamped, not crashed


def test_iter_codes_matches_fallback_and_straddles(tmp_path):
    """The native window scan, the numpy fallback, and a 100-byte
    window (records straddling every boundary) must produce identical
    code streams; hpc collapses runs identically up to duplicate
    breakers."""
    import random

    from meryl_tpu import native
    from meryl_tpu.io import bam as B

    random.seed(3)
    reads = [(f"r{i}",
              "".join(random.choices("ACGTN", weights=[4, 4, 4, 4, 1],
                                     k=random.choice([0, 3, 150, 151]))),
              None) for i in range(500)]
    p = str(tmp_path / "mix.bam")
    _make_bam(p, reads)
    got = np.concatenate(list(B.iter_codes(p)))
    # reference: per-record decode
    want = []
    code = {65: 0, 67: 1, 84: 2, 71: 3}
    for _, s, _ in reads:
        want.extend(code.get(ord(c), 0xFF) for c in s)
        want.append(0xFF)
    assert np.array_equal(got, np.array(want, np.uint8))
    # numpy fallback path
    orig = native.get_lib
    native.get_lib = lambda: None
    try:
        got_py = np.concatenate(list(B.iter_codes(p)))
    finally:
        native.get_lib = orig
    assert np.array_equal(got_py, got)
    # window straddling
    got_tiny = np.concatenate(list(B.iter_codes(p, window=100)))
    assert np.array_equal(got_tiny, got)
    # hpc: equal after collapsing duplicate breakers on both sides
    def squeeze(a):
        keep = np.ones(len(a), bool)
        keep[1:] = ~((a[1:] == a[:-1]) & (a[1:] == 0xFF))
        return a[keep]
    got_h = squeeze(np.concatenate(list(B.iter_codes(p, hpc=True))))
    wh = []
    for _, s, _ in reads:
        prev = None
        for c in s:
            if c != prev:
                wh.append(code.get(ord(c), 0xFF))
            prev = c
        wh.append(0xFF)
    assert np.array_equal(got_h, squeeze(np.array(wh, np.uint8)))
