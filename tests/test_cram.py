"""Dependency-free CRAM 3.0 reader vs the spec-driven test encoder.

The encoder (tests/cram_writer.py) is written against the CRAM 3.0
spec independently of the decoder so each checks the other's reading
of the format.  Covers: itf8/ltf8, rANS-4x8 order 0/1, gzip blocks,
unmapped records (BA), mapped records reconstructed from reference +
X/D/I/S/b/i features, AP delta, substitution matrix, generated names,
and counting a CRAM end-to-end through the CLI.
"""

import numpy as np
import pytest

from meryl_tpu.io import cram
from meryl_tpu.io.sequence import iter_sequences

from tests import cram_writer as cw


# ---------------------------------------------------------- primitives

def test_itf8_roundtrip():
    for v in (0, 1, 127, 128, 300, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
              0xFFFFFFF, 0x10000000, 0x7FFFFFFF, -1, -2):
        buf = cw.itf8(v)
        got, pos = cram.read_itf8(buf, 0)
        assert got == v, v
        assert pos == len(buf)


def test_ltf8_roundtrip():
    for v in (0, 1, 127, 128, 1 << 20, 1 << 35, (1 << 47) - 3, 1 << 60):
        buf = cw.ltf8(v)
        got, pos = cram.read_ltf8(buf, 0)
        assert got == v, v
        assert pos == len(buf)


@pytest.mark.parametrize("order", [0, 1])
def test_rans_roundtrip(order):
    rng = np.random.default_rng(4)
    for n in (1, 5, 64, 1000, 4097):
        # skewed alphabet, like quality strings
        data = bytes(rng.choice([65, 67, 71, 84, 78],
                                p=[.4, .3, .2, .08, .02], size=n))
        enc = cw.rans_encode_o0(data) if order == 0 else \
            cw.rans_encode_o1(data)
        assert cram.rans_decode(enc) == data, (order, n)


# ------------------------------------------------------------- records

READS = [("r1", "ACGTACGTAACCGGTT"),
         ("r2", "GGGTTTAAACCC"),
         ("r3", "ACACACACACACACAC")]


@pytest.mark.parametrize("method", [0, 1, 4, 41, 5, 51, 52, 6, 61])
def test_unmapped_roundtrip(tmp_path, method):
    p = str(tmp_path / "u.cram")
    cw.write_unmapped_cram(p, READS, method=method)
    got = [(n, s.decode()) for n, s, _ in cram.iter_cram(p)]
    assert got == READS


def test_unsupported_name_codec_lazy(tmp_path):
    """CRAM 3.1 files often compress names with the tokenizer (method
    8) and qualities with fqzcomp (7).  Blocks decompress lazily, so
    sequences still extract; names fall back to synthetic."""
    p = str(tmp_path / "tok.cram")
    cw.write_unmapped_cram(p, READS, method=5,
                           series_methods={"RN": 97})
    got = [(n, s.decode()) for n, s, _ in cram.iter_cram(p)]
    assert [s for _, s in got] == [s for _, s in READS]
    assert all(n.startswith("tok.cram.") for n, _ in got)


def test_unsupported_method_still_raises_when_read(tmp_path):
    """A sequence-bearing block with an unsupported codec must still
    fail loudly (lazily) — not silently yield garbage."""
    p = str(tmp_path / "bad.cram")
    cw.write_unmapped_cram(p, READS, method=5,
                           series_methods={"BA": 97})
    with pytest.raises(cram.CramError, match="method 9"):
        list(cram.iter_cram(p))


def test_unmapped_generated_names(tmp_path):
    p = str(tmp_path / "n.cram")
    cw.write_unmapped_cram(p, READS, with_names=False)
    got = [s.decode() for _, s, _ in cram.iter_cram(p)]
    assert got == [s for _, s in READS]


REF = "ACGTACGTAACCGGTTACGTACGTTTTTGGGGCCCCAAAA"


def test_mapped_features(tmp_path, monkeypatch):
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(f">chr1\n{REF}\n")
    monkeypatch.setenv("MERYL_TPU_CRAM_REF", str(ref_fa))
    p = str(tmp_path / "m.cram")
    # read A: pure reference copy, pos 1 len 10 -> REF[0:10]
    # read B: substitution at read pos 3 (1-based): code maps via the
    #         0x1B identity matrix: ref base REF[7]='T', others of T in
    #         ACGN order: code 2 -> 'G'
    # read C: deletion of 4 after 5 ref bases, then reference copy
    # read D: soft clip 'TT' at front, then ref copy from pos 1
    # read E: insertion 'AAA' after 2 ref bases
    reads = [
        ("A", 1, 10, []),
        ("B", 6, 5, [("X", 3, 2)]),
        ("C", 11, 8, [("D", 6, 4)]),
        ("D", 1, 8, [("S", 1, "TT")]),
        ("E", 21, 7, [("I", 3, "AAA")]),
    ]
    cw.write_mapped_cram(p, "chr1", REF, reads)
    got = {n: s.decode() for n, s, _ in cram.iter_cram(p)}
    assert got["A"] == REF[0:10]
    want_b = REF[5:7] + "G" + REF[8:10]
    assert got["B"] == want_b
    assert got["C"] == REF[10:15] + REF[19:22]
    assert got["D"] == "TT" + REF[0:6]
    assert got["E"] == REF[20:22] + "AAA" + REF[22:24]


def test_mapped_ap_delta(tmp_path, monkeypatch):
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(f">chr1\n{REF}\n")
    monkeypatch.setenv("MERYL_TPU_CRAM_REF", str(ref_fa))
    p = str(tmp_path / "d.cram")
    reads = [("A", 3, 6, []), ("B", 9, 6, []), ("C", 15, 6, [])]
    cw.write_mapped_cram(p, "chr1", REF, reads, ap_delta=True)
    got = {n: s.decode() for n, s, _ in cram.iter_cram(p)}
    assert got == {"A": REF[2:8], "B": REF[8:14], "C": REF[14:20]}


def test_iter_sequences_dispatch(tmp_path):
    p = str(tmp_path / "u.cram")
    cw.write_unmapped_cram(p, READS)
    got = [(n, s.decode()) for n, s, _ in iter_sequences(p)]
    assert got == READS


def test_cram_count_cli(tmp_path):
    """End-to-end: count kmers straight from a CRAM via the CLI."""
    import io
    import contextlib
    from meryl_tpu import cli, oracle, kmer as km
    from meryl_tpu.db import MerylDB

    rng = np.random.default_rng(6)
    reads = [("q%d" % i,
              "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=400)))
             for i in range(4)]
    p = str(tmp_path / "reads.cram")
    cw.write_unmapped_cram(p, reads, method=4)
    db = str(tmp_path / "c.meryl")
    assert cli.main(["k=13", "count", p, "output", db]) == 0
    hi, lo, c = MerylDB.open(db).load_all()
    ohi, olo, oc = oracle.count_kmers([s for _, s in reads], 13)
    assert hi.tolist() == ohi.tolist()
    assert c.tolist() == oc.tolist()


def test_huffman_canonical_tiebreak():
    """Canonical huffman assigns codes within a bit length in ascending
    SYMBOL order (CRAM spec / htslib), not input order."""
    from meryl_tpu.io.cram import HuffmanCodec
    h = HuffmanCodec([5, 3], [1, 1])
    assert h.table == {(1, 0): 3, (1, 1): 5}
    h2 = HuffmanCodec([9, 2, 7], [2, 1, 2])
    # symbol 2 gets the single 1-bit code; 7 < 9 within length 2
    assert h2.table == {(1, 0): 2, (2, 2): 7, (2, 3): 9}


def test_iter_cram_codes_matches_per_record(tmp_path):
    """The bulk counting decoder equals LUT(record bases) + breakers,
    across batch boundaries and with hpc."""
    import random

    from meryl_tpu.kmer import CODE_LUT

    random.seed(11)
    reads = [(f"r{i}", "".join(random.choices(
        "ACGTN", weights=[4, 4, 4, 4, 1],
        k=random.choice([0, 3, 150, 151])))) for i in range(300)]
    p = str(tmp_path / "c.cram")
    cw.write_unmapped_cram(p, reads, method=5)
    got = np.concatenate(list(cram.iter_cram_codes(p, batch=1000)))
    want = []
    for _, s in reads:
        want.extend(int(CODE_LUT[b]) for b in s.encode())
        want.append(0xFF)
    assert np.array_equal(got, np.array(want, np.uint8))

    def squeeze(a):  # duplicate breakers are semantically null
        keep = np.ones(len(a), bool)
        keep[1:] = ~((a[1:] == a[:-1]) & (a[1:] == 0xFF))
        return a[keep]

    got_h = np.concatenate(list(cram.iter_cram_codes(p, hpc=True,
                                                     batch=1000)))
    wh = np.array(want, np.uint8)
    keep = np.ones(len(wh), bool)
    keep[1:] = wh[1:] != wh[:-1]
    assert np.array_equal(squeeze(got_h), squeeze(wh[keep]))


def test_cram_counting_via_chunker(tmp_path):
    """CRAM counting flows through the bulk codes path and matches the
    FASTA count of the same reads."""
    import random

    from meryl_tpu.counter import count_to_arrays

    random.seed(13)
    reads = [(f"r{i}", "".join(random.choices("ACGT", k=120)))
             for i in range(40)]
    p = str(tmp_path / "c.cram")
    cw.write_unmapped_cram(p, reads, method=41)
    fa = tmp_path / "c.fa"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in reads))
    k = 21
    a = count_to_arrays([p], k)
    b = count_to_arrays([str(fa)], k)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_shared_content_id_uses_per_record_path(tmp_path):
    """Two series sharing one external block (spec-legal: values
    interleave per record) must NOT go through the bulk fast path —
    regression: RL parsed AP values and silently mis-sliced BA."""
    reads = READS
    ids = dict(cw.IDS)
    ids["AP"] = ids["RL"]          # AP rides in RL's block
    streams = {k: bytearray() for k in
               ("BF", "CF", "RL", "RG", "RN", "TL", "BA")}
    for name, seq in reads:
        streams["BF"] += cw.itf8(4)
        streams["CF"] += cw.itf8(0)
        streams["RL"] += cw.itf8(len(seq)) + cw.itf8(0)  # RL,AP pairs
        streams["RG"] += cw.itf8(-1)
        streams["RN"] += name.encode() + b"\n"
        streams["TL"] += cw.itf8(0)
        streams["BA"] += seq.encode()
    series = ("BF", "CF", "RL", "AP", "RG", "RN", "TL", "BA")
    old = cw.IDS
    cw.IDS = ids
    try:
        ch = cw.compression_header(read_names=True, series=series)
    finally:
        cw.IDS = old
    ch_blk = cw.block(0, 1, 0, ch)
    used = ["BF", "CF", "RL", "RG", "RN", "TL", "BA"]
    sh = cw.slice_header(-1, 0, 0, len(reads), [old[k] for k in used])
    blocks = [cw.block(0, 2, 0, sh), cw.block(0, 5, 0, b"")]
    for k in used:
        blocks.append(cw.block(0, 4, old[k], bytes(streams[k])))
    cont = cw.container([ch_blk] + blocks, ref_id=-1, nrec=len(reads),
                        landmarks=(len(ch_blk),))
    p = str(tmp_path / "shared.cram")
    with open(p, "wb") as f:
        f.write(cw.file_definition())
        f.write(cw.sam_header_container([("ref", 1000)]))
        f.write(cont)
        f.write(cw.EOF_CONTAINER)
    got = [(n, s.decode()) for n, s, _ in cram.iter_cram(p)]
    assert got == reads


def test_quality_passthrough(tmp_path):
    """Stored qualities come back Phred+33 through both the bulk and
    per-record paths; fqzcomp-compressed quality blocks degrade to
    None without blocking sequences."""
    quals = ["IIIIIIIIIIIIIIII", None, "!#5~AAAAAAAAAAAA"]
    p = str(tmp_path / "q.cram")
    cw.write_unmapped_cram(p, READS, method=5, quals=quals)
    got = list(cram.iter_cram(p))
    assert [(n, s.decode()) for n, s, _ in got] == READS
    assert [q.decode() if q else None for _, _, q in got] == quals
    # per-record path (bulk disabled)
    r = cram.CramReader(p)
    r.want_quals = True
    r._bulk_unmapped = lambda *a: None
    got2 = list(r.records())
    assert got2 == got
    # counting never touches QS
    codes = np.concatenate(list(cram.iter_cram_codes(p)))
    assert len(codes) == sum(len(s) for _, s in READS) + len(READS)
    # unsupported-codec QS block: sequences fine, quals None
    p2 = str(tmp_path / "fqz.cram")
    cw.write_unmapped_cram(p2, READS, method=5, quals=quals,
                           series_methods={"QS": 97})
    got3 = list(cram.iter_cram(p2))
    assert [(n, s.decode()) for n, s, _ in got3] == READS
    assert all(q is None for _, _, q in got3)

def test_qs_shared_content_id_quals_correct(tmp_path):
    """QS sharing an external block with AP (spec-legal) must bail out
    of the bulk fast path when quals are wanted — regression: the
    shared-cid guard omitted QS, so the bulk path sliced interleaved
    AP+QS bytes from offset 0 and returned garbage qualities."""
    reads = READS
    quals = ["IIIIIIIIIIIIIIII", "!#5~AAAAAAAA", "KKKKKKKKKKKKKKKK"]
    ids = dict(cw.IDS)
    ids["QS"] = ids["AP"]          # QS rides in AP's block
    streams = {k: bytearray() for k in
               ("BF", "CF", "RL", "AP", "RG", "RN", "TL", "BA")}
    for (name, seq), q in zip(reads, quals):
        streams["BF"] += cw.itf8(4)
        streams["CF"] += cw.itf8(1)
        streams["RL"] += cw.itf8(len(seq))
        # per-record decode order is ... AP ... then QS: interleave
        streams["AP"] += cw.itf8(0) + bytes(ord(c) - 33 for c in q)
        streams["RG"] += cw.itf8(-1)
        streams["RN"] += name.encode() + b"\n"
        streams["TL"] += cw.itf8(0)
        streams["BA"] += seq.encode()
    series = ("BF", "CF", "RL", "AP", "RG", "RN", "TL", "BA", "QS")
    old = cw.IDS
    cw.IDS = ids
    try:
        ch = cw.compression_header(read_names=True, series=series)
    finally:
        cw.IDS = old
    ch_blk = cw.block(0, 1, 0, ch)
    used = ["BF", "CF", "RL", "AP", "RG", "RN", "TL", "BA"]
    sh = cw.slice_header(-1, 0, 0, len(reads), [old[k] for k in used])
    blocks = [cw.block(0, 2, 0, sh), cw.block(0, 5, 0, b"")]
    for k in used:
        blocks.append(cw.block(0, 4, old[k], bytes(streams[k])))
    cont = cw.container([ch_blk] + blocks, ref_id=-1, nrec=len(reads),
                        landmarks=(len(ch_blk),))
    p = str(tmp_path / "qshare.cram")
    with open(p, "wb") as f:
        f.write(cw.file_definition())
        f.write(cw.sam_header_container([("ref", 1000)]))
        f.write(cont)
        f.write(cw.EOF_CONTAINER)
    got = list(cram.iter_cram(p, want_quals=True))
    assert [(n, s.decode()) for n, s, _ in got] == reads
    assert [q.decode() for _, _, q in got] == quals
    # quals unwanted: QS untouched, bulk path fine
    got2 = [(n, s.decode()) for n, s, _ in
            cram.iter_cram(p, want_quals=False)]
    assert got2 == reads


def test_core_codec_qs_keeps_name_continuity(tmp_path):
    """A core-codec QS (huffman constant — spec-legal) bails the bulk
    path to the per-record decoder.  Regression: the bail happened
    after the generated-name counter had advanced, so names skipped
    nrec indices; and HuffmanCodec lacked read_byte entirely."""
    quals = ["I" * len(s) for _, s in READS]
    p = str(tmp_path / "coreqs.cram")
    cw.write_unmapped_cram(
        p, READS, quals=quals, with_names=False,
        codec_overrides={"QS": cw.encoding_huffman_single(ord("I") - 33)})
    got = list(cram.iter_cram(p, want_quals=True))
    assert [s.decode() for _, s, _ in got] == [s for _, s in READS]
    assert [q.decode() for _, _, q in got] == quals
    # generated names must start at .1 exactly as the pure
    # per-record decoder produces them
    assert [n for n, _, _ in got] == \
        [f"coreqs.cram.{i + 1}" for i in range(len(READS))]


def test_corrupt_qs_block_fails_loudly(tmp_path):
    """A genuinely corrupt QS block (bad gzip stream) must raise, not
    silently degrade quals to None — only the unsupported-codec case
    (fqzcomp/tok3) degrades."""
    quals = ["I" * len(s) for _, s in READS]
    p = str(tmp_path / "badqs.cram")
    cw.write_unmapped_cram(p, READS, quals=quals,
                           series_methods={"QS": 98})
    with pytest.raises(cram.CramError):
        list(cram.iter_cram(p, want_quals=True))
    # quals unwanted: lazy blocks never decompress the bad QS
    got = [(n, s.decode()) for n, s, _ in
           cram.iter_cram(p, want_quals=False)]
    assert got == READS


def test_multi_container_roundtrip(tmp_path):
    """Reads split over several containers come back whole and in
    order through both the records and the codes paths."""
    import random
    random.seed(41)
    reads = [(f"m{i}", "".join(random.choices("ACGTN", k=random.choice(
        [0, 7, 80, 200])))) for i in range(500)]
    p = str(tmp_path / "mc.cram")
    cw.write_unmapped_cram(p, reads, method=5, reads_per_container=64)
    got = [(n, s.decode()) for n, s, _ in cram.iter_cram(p)]
    assert got == reads


def test_parallel_container_codes_equal_serial(tmp_path, monkeypatch):
    """The concurrent container decoder must emit exactly the serial
    stream (containers come back in file order), with and without hpc,
    including fallback containers (a shared content id forces the
    per-record path) interleaved between bulk ones."""
    import random
    random.seed(43)
    reads = [(f"p{i}", "".join(random.choices("ACGTN", k=random.choice(
        [0, 3, 150, 151])))) for i in range(600)]
    p = str(tmp_path / "pc.cram")
    cw.write_unmapped_cram(p, reads, method=5, reads_per_container=50)
    for hpc in (False, True):
        monkeypatch.setenv("MERYL_TPU_PAR_CRAM", "0")
        a = np.concatenate(list(cram.iter_cram_codes(p, hpc=hpc)))
        monkeypatch.setenv("MERYL_TPU_PAR_CRAM", "1")
        b = np.concatenate(list(cram.iter_cram_codes(p, hpc=hpc)))
        assert np.array_equal(a, b)
    # explicit thread count exercises the pool path regardless of env
    c = np.concatenate(list(cram.iter_cram_codes(p, threads=4)))
    monkeypatch.setenv("MERYL_TPU_PAR_CRAM", "0")
    assert np.array_equal(c, np.concatenate(
        list(cram.iter_cram_codes(p))))


def test_parallel_codes_with_fallback_containers(tmp_path, monkeypatch):
    """Containers needing the per-record path decode correctly inside
    the thread pool via the private reader clone (forced here by
    disabling the bulk decoder entirely)."""
    import random
    random.seed(47)
    reads = [(f"f{i}", "".join(random.choices("ACGT", k=60)))
             for i in range(120)]
    p = str(tmp_path / "fb.cram")
    cw.write_unmapped_cram(p, reads, method=5, reads_per_container=40)
    want = np.concatenate(list(cram.iter_cram_codes(p, threads=1)))
    monkeypatch.setattr(cram.CramReader, "_bulk_ba",
                        lambda self, ch, sh, ext, extra_bulk_keys=():
                        None)
    got = np.concatenate(list(cram.iter_cram_codes(p, threads=4)))
    assert np.array_equal(got, want)


def test_mapped_cram_codes_path(tmp_path, monkeypatch):
    """Mapped records (reference-reconstructed) flow through the codes
    path via the per-record fallback."""
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(f">chr1\n{REF}\n")
    monkeypatch.setenv("MERYL_TPU_CRAM_REF", str(ref_fa))
    p = str(tmp_path / "mc2.cram")
    reads = [("A", 1, 10, []), ("B", 6, 5, [("X", 3, 2)])]
    cw.write_mapped_cram(p, "chr1", REF, reads)
    from meryl_tpu.kmer import CODE_LUT
    seqs = [s for _, s, _ in cram.iter_cram(p)]
    want = []
    for s in seqs:
        want.extend(int(CODE_LUT[b]) for b in s)
        want.append(0xFF)
    got = np.concatenate(list(cram.iter_cram_codes(p)))
    assert np.array_equal(got, np.array(want, np.uint8))
