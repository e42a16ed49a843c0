"""fqzcomp quality codec (CRAM 3.1 method 7) round-trip and wire
tests, plus end-to-end CRAM integration (fqzcomp-compressed QS blocks
decode back to the stored qualities)."""

import random

import pytest

from meryl_tpu.io import fqzcomp
from meryl_tpu.io.fqzcomp import (
    PFLAG_DO_DEDUP, PFLAG_DO_LEN, PFLAG_DO_SEL, PFLAG_HAVE_DTAB,
    PFLAG_HAVE_PTAB, PFLAG_HAVE_QMAP, PFLAG_HAVE_QTAB, FqzError, _Param,
    _read_array, _write_array)
from meryl_tpu.io.rans_nx16 import _Cur


def _records(n=40, lo=4, hi=90, nsym=40, seed=7):
    rng = random.Random(seed)
    recs = []
    for _ in range(n):
        m = rng.randrange(lo, hi)
        # quality-like: random walk clamped to [0, nsym)
        q = rng.randrange(nsym)
        rec = []
        for _ in range(m):
            q = max(0, min(nsym - 1, q + rng.choice((-2, -1, 0, 0, 1, 2))))
            rec.append(q)
        recs.append(bytes(rec))
    return recs


def _roundtrip(recs, **kw):
    blob = fqzcomp.encode(recs, **kw)
    out = fqzcomp.decode(blob, sum(len(r) for r in recs))
    assert out == b"".join(recs)
    return blob


def test_roundtrip_basic():
    _roundtrip(_records())


def test_roundtrip_fixed_len():
    recs = _records(lo=50, hi=51)           # all length 50
    pm = _Param(pflags=0, max_sym=40)       # no DO_LEN: length sent once
    blob = fqzcomp.encode(recs, params=[pm])
    assert fqzcomp.decode(blob, sum(map(len, recs))) == b"".join(recs)


def test_roundtrip_qmap():
    # sparse symbol set -> QMAP remaps to a dense code space
    syms = [33, 37, 53, 70]
    rng = random.Random(3)
    recs = [bytes(rng.choice(syms) for _ in range(60)) for _ in range(25)]
    pm = _Param(pflags=PFLAG_DO_LEN | PFLAG_HAVE_QMAP,
                max_sym=len(syms), qmap=syms)
    blob = fqzcomp.encode(recs, params=[pm])
    assert fqzcomp.decode(blob, sum(map(len, recs))) == b"".join(recs)


def test_roundtrip_tables():
    # qtab buckets the history, ptab/dtab add position and delta context
    qtab = [min(i // 4, 15) for i in range(256)]
    ptab = [min(i // 128, 7) for i in range(1024)]
    dtab = [min(i // 16, 7) for i in range(256)]
    pm = _Param(pflags=PFLAG_DO_LEN | PFLAG_HAVE_QTAB | PFLAG_HAVE_PTAB
                | PFLAG_HAVE_DTAB,
                max_sym=40, qbits=4, qshift=4, qloc=4, ploc=8, dloc=11,
                qtab=qtab, ptab=ptab, dtab=dtab)
    recs = _records(seed=11)
    blob = fqzcomp.encode(recs, params=[pm])
    assert fqzcomp.decode(blob, sum(map(len, recs))) == b"".join(recs)


def test_roundtrip_dedup():
    base = _records(n=6, seed=5)
    recs = []
    for r in base:
        recs.append(r)
        recs.append(r)                       # exact duplicate follows
    pm = _Param(pflags=PFLAG_DO_LEN | PFLAG_DO_DEDUP, max_sym=40)
    blob = fqzcomp.encode(recs, params=[pm])
    assert fqzcomp.decode(blob, sum(map(len, recs))) == b"".join(recs)


def test_roundtrip_rev():
    recs = _records(n=20, seed=9)
    revs = [i % 3 == 0 for i in range(len(recs))]
    blob = fqzcomp.encode(recs, revs=revs)
    assert fqzcomp.decode(blob, sum(map(len, recs))) == b"".join(recs)


def test_roundtrip_multi_param_and_sel():
    pm0 = _Param(pflags=PFLAG_DO_LEN | PFLAG_DO_SEL, max_sym=40,
                 qbits=6, sloc=14)
    pm1 = _Param(pflags=PFLAG_DO_LEN, max_sym=40, context=0x8000)
    recs = _records(n=30, seed=13)
    blob = fqzcomp.encode(recs, params=[pm0, pm1])
    assert fqzcomp.decode(blob, sum(map(len, recs))) == b"".join(recs)


def test_roundtrip_stab():
    pm0 = _Param(pflags=PFLAG_DO_LEN, max_sym=40)
    pm1 = _Param(pflags=PFLAG_DO_LEN, max_sym=40, context=0x4000)
    recs = _records(n=24, seed=17)
    # selectors 0..3 fold onto the two parameter sets
    blob = fqzcomp.encode(recs, params=[pm0, pm1], stab=[0, 0, 1, 1])
    assert fqzcomp.decode(blob, sum(map(len, recs))) == b"".join(recs)


def test_array_wire_roundtrip():
    cases = [
        [0] * 256,
        list(range(256)),
        [min(i // 4, 15) for i in range(256)],
        [0] * 100 + [1] * 100 + [2] * 56,
        [min(i // 300, 3) for i in range(1024)],
    ]
    for arr in cases:
        blob = _write_array(arr, len(arr))
        assert _read_array(_Cur(blob), len(arr)) == arr


def test_array_rejects_non_monotone():
    with pytest.raises(FqzError):
        _write_array([1, 0], 2)


def test_bad_version_raises():
    with pytest.raises(FqzError):
        fqzcomp.decode(b"\x04\x00" + b"\x00" * 16, 10)


def test_truncated_raises():
    recs = _records(n=10)
    blob = fqzcomp.encode(recs)
    with pytest.raises(Exception):
        fqzcomp.decode(blob[: len(blob) // 3],
                       sum(len(r) for r in recs))


def test_wrong_size_raises():
    recs = _records(n=10)
    blob = fqzcomp.encode(recs)
    with pytest.raises(FqzError):
        # one byte short: the final record overruns the output
        fqzcomp.decode(blob, sum(len(r) for r in recs) - 1)


def test_cram_block_method7(tmp_path):
    """A CRAM whose QS block is fqzcomp-compressed now yields real
    qualities (previously: degraded to None)."""
    from meryl_tpu.io import cram
    from tests import cram_writer as cw
    reads = [("r1", "ACGTACGTACGTACGT"), ("r2", "GGGGCCCCAAAATTTT"),
             ("r3", "ACACACACACACACAC")]
    quals = ["IIIIIIIIIIIIIIII", "!#5~AAAAAAAAAAAA", "BBBBBBBBBBBBBBBB"]
    p = str(tmp_path / "fqz7.cram")
    cw.write_unmapped_cram(p, reads, method=5, quals=quals,
                           series_methods={"QS": 7})
    got = list(cram.iter_cram(p))
    assert [(n, s.decode()) for n, s, _ in got] == reads
    assert [q.decode() for _, _, q in got] == quals


def test_native_fqz_matches_python(monkeypatch):
    """The C fqzcomp core must agree byte-for-byte with the Python
    reference decoder across every parameter feature."""
    from meryl_tpu import native

    if not (native.available()
            and hasattr(native.get_lib(), "mt_fqz_decode")):
        pytest.skip("native fqz core unavailable")
    cases = []
    recs = _records(n=60, seed=3)
    cases.append(fqzcomp.encode(recs))
    qtab = [min(i // 4, 15) for i in range(256)]
    ptab = [min(i // 128, 7) for i in range(1024)]
    dtab = [min(i // 16, 7) for i in range(256)]
    pm = _Param(pflags=PFLAG_DO_LEN | PFLAG_HAVE_QTAB | PFLAG_HAVE_PTAB
                | PFLAG_HAVE_DTAB,
                max_sym=40, qbits=4, qshift=4, qloc=4, ploc=8, dloc=11,
                qtab=qtab, ptab=ptab, dtab=dtab)
    cases.append(fqzcomp.encode(recs, params=[pm]))
    pm0 = _Param(pflags=PFLAG_DO_LEN | PFLAG_DO_SEL, max_sym=40,
                 qbits=6, sloc=14)
    pm1 = _Param(pflags=PFLAG_DO_LEN | PFLAG_DO_DEDUP, max_sym=40,
                 context=0x8000)
    dup = [r for r in recs[:10] for _ in (0, 1)]
    cases.append(fqzcomp.encode(dup, params=[pm0, pm1],
                                stab=[0, 0, 1, 1]))
    cases.append(fqzcomp.encode(recs, revs=[i % 2 == 0
                                            for i in range(len(recs))]))
    syms = [33, 37, 53, 70]
    import random as _r
    _r.seed(5)
    qrecs = [bytes(_r.choice(syms) for _ in range(50)) for _ in range(20)]
    pmq = _Param(pflags=PFLAG_DO_LEN | PFLAG_HAVE_QMAP,
                 max_sym=len(syms), qmap=syms)
    cases.append((fqzcomp.encode(qrecs, params=[pmq]),
                  sum(map(len, qrecs))))
    tot = sum(map(len, recs))
    dtot = sum(map(len, dup))
    sizes = [tot, tot, dtot, tot]
    for i, blob in enumerate(cases):
        if isinstance(blob, tuple):
            blob, sz = blob
        else:
            sz = sizes[i]
        got_native = fqzcomp.decode(blob, sz)
        monkeypatch.setattr(native, "fqz_core", lambda *a, **k: None)
        got_python = fqzcomp.decode(blob, sz)
        monkeypatch.undo()
        assert got_native == got_python, i


def test_zero_size_decode(monkeypatch):
    """out_size=0 must return b'' identically on the native core and
    the Python fallback (the fallback used to crash)."""
    from meryl_tpu import native
    blob = fqzcomp.encode([])
    assert fqzcomp.decode(blob, 0) == b""
    monkeypatch.setattr(native, "fqz_core", lambda *a, **k: None)
    assert fqzcomp.decode(blob, 0) == b""


def test_unparseable_fqz_qs_degrades(tmp_path):
    """A method-7 QS block whose stream does not parse must degrade to
    bare quals (our fqzcomp wire format is spec-reconstructed; a real
    htslib stream that diverges must not abort sequence extraction)."""
    from meryl_tpu.io import cram
    from tests import cram_writer as cw
    reads = [("r1", "ACGTACGTACGTACGT"), ("r2", "GGGGCCCCAAAATTTT")]
    quals = ["IIIIIIIIIIIIIIII", "BBBBBBBBBBBBBBBB"]
    p = str(tmp_path / "badfqz.cram")
    cw.write_unmapped_cram(p, reads, method=5, quals=quals,
                           series_methods={"QS": 96})
    got = list(cram.iter_cram(p))
    assert [(n, s.decode()) for n, s, _ in got] == reads
    assert all(q is None for _, _, q in got)
