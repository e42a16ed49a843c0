"""tok3 name-tokenizer codec (CRAM 3.1 method 8) round-trip and wire
tests, plus CRAM integration (tok3-compressed RN blocks decode back to
the stored read names)."""

import random

import pytest

from meryl_tpu.io import tok3
from meryl_tpu.io.tok3 import Tok3Error


def _blob(names, sep=b"\x00"):
    return b"".join(n + sep for n in names)


ILLUMINA = [
    b"@SRR123.1 HWI-ST1276:71:C1162ACXX:1:1101:1208:2458",
    b"@SRR123.2 HWI-ST1276:71:C1162ACXX:1:1101:1210:2463",
    b"@SRR123.3 HWI-ST1276:71:C1162ACXX:1:1101:1209:2470",
    b"@SRR123.10 HWI-ST1276:71:C1162ACXX:1:1102:0031:2471",
]


@pytest.mark.parametrize("use_arith", [False, True])
def test_roundtrip_illumina(use_arith):
    # a tile's worth of sequential illumina-style names
    names = [b"HWI-ST1276:71:C1162ACXX:1:1101:%d:%d" % (1200 + i, 2458 + 2 * i)
             for i in range(64)]
    data = _blob(names)
    blob = tok3.encode(data, use_arith=use_arith)
    assert tok3.decode(blob, len(data)) == data
    # column delta/match coding beats the raw text
    assert len(blob) < len(data) // 2


def test_roundtrip_mixed_shapes():
    names = [b"read_1", b"read_2", b"read_2", b"r", b"", b"x" * 300,
             b"a0001", b"a0002", b"a002", b"9" * 12, b"2147483648",
             b"99999999999999999999", b"!@#$%^&*()", b"mix3d_0up42"]
    data = _blob(names)
    blob = tok3.encode(data)
    assert tok3.decode(blob, len(data)) == data


def test_roundtrip_newline_sep():
    data = _blob([b"q1", b"q2", b"q3"], sep=b"\n")
    blob = tok3.encode(data)
    assert tok3.decode(blob, len(data)) == data


def test_roundtrip_random_fuzz():
    rng = random.Random(23)
    alphabet = (b"abcXYZ0123456789._:/-#"
                b"    ")
    names = []
    for _ in range(200):
        m = rng.randrange(0, 40)
        names.append(bytes(rng.choice(alphabet) for _ in range(m)))
    data = _blob(names)
    blob = tok3.encode(data)
    assert tok3.decode(blob, len(data)) == data


def test_duplicate_names_use_dup_tokens():
    names = [b"dupname:1234"] * 50
    data = _blob(names)
    blob = tok3.encode(data)
    assert tok3.decode(blob, len(data)) == data
    assert len(blob) < len(data) // 2


def test_empty():
    assert tok3.decode(tok3.encode(b""), 0) == b""


def test_size_mismatch_raises():
    data = _blob([b"a", b"b"])
    blob = tok3.encode(data)
    with pytest.raises(Tok3Error):
        tok3.decode(blob, len(data) + 1)


def test_truncated_raises():
    data = _blob([b"abcdef%d" % i for i in range(50)])
    blob = tok3.encode(data)
    with pytest.raises(Exception):
        tok3.decode(blob[: len(blob) // 2], len(data))


def test_cram_rn_block_method8(tmp_path):
    """A CRAM whose RN block is tok3-compressed yields the real read
    names (previously: generated fallbacks)."""
    from meryl_tpu.io import cram
    from tests import cram_writer as cw
    reads = [("inst:1:100:2000:3000", "ACGTACGTACGTACGT"),
             ("inst:1:100:2000:3001", "GGGGCCCCAAAATTTT"),
             ("inst:1:100:2001:3002", "ACACACACACACACAC")]
    p = str(tmp_path / "tok3.cram")
    cw.write_unmapped_cram(p, reads, method=5,
                           series_methods={"RN": 8})
    got = [(n, s.decode()) for n, s, _ in cram.iter_cram(p)]
    assert got == reads
