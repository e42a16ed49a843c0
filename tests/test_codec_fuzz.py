"""Adversarial fuzz for the spec-reconstructed CRAM 3.1 codecs
(VERDICT r2 item 8): the fqzcomp and tok3 wire formats have no
htslib-written sample files to cross-check in this zero-egress
environment, so the risk surface is shrunk the other way —

  1. roundtrip across the full parameter-flag matrix (multi-param,
     selector table, dedup, reverse, qmap/ptab/dtab/qtab contexts;
     tok3 with both entropy coders and pathological name shapes),
  2. mutation + truncation fuzz on every encoded stream asserting a
     BOUNDED failure mode: either a clean decode (bytes) or a codec
     error type — never a hang, never an unrelated exception,
  3. native-core vs pure-Python decoder differentials on the same
     randomized streams (the Python model is the oracle for the C
     entropy cores, native/mt_arith.cpp).

Reference: htscodecs plays the conformance role for the reference
build (/root/reference/src/main.mk:92-140)."""

import random

import numpy as np
import pytest

from meryl_tpu.io import fqzcomp, tok3
from meryl_tpu.io.arith import ArithError
from meryl_tpu.io.rans_nx16 import RansError

BOUNDED = (ArithError, RansError, ValueError, EOFError)


def _fqz_param_matrix():
    P = fqzcomp._Param
    F = fqzcomp
    qtab = [min(i // 4, 15) for i in range(256)]
    ptab = [min(i // 64, 7) for i in range(1024)]
    dtab = [min(i // 16, 3) for i in range(256)]
    cases = []
    cases.append(dict(params=None))                       # auto
    cases.append(dict(params=[P(max_sym=41,
                                pflags=F.PFLAG_DO_LEN
                                | F.PFLAG_DO_DEDUP)]))
    cases.append(dict(params=[P(max_sym=41, qbits=6, qshift=4,
                                pflags=F.PFLAG_DO_LEN
                                | F.PFLAG_HAVE_QTAB,
                                qtab=qtab)]))
    cases.append(dict(params=[P(max_sym=41, ploc=6,
                                pflags=F.PFLAG_DO_LEN
                                | F.PFLAG_HAVE_PTAB,
                                ptab=ptab)]))
    cases.append(dict(params=[P(max_sym=41, dloc=4,
                                pflags=F.PFLAG_DO_LEN
                                | F.PFLAG_HAVE_DTAB,
                                dtab=dtab)]))
    # multi-param + selector table
    cases.append(dict(
        params=[P(max_sym=41, pflags=F.PFLAG_DO_LEN | F.PFLAG_DO_SEL,
                  sloc=14),
                P(max_sym=41, pflags=F.PFLAG_DO_LEN | F.PFLAG_DO_SEL,
                  sloc=14)],
        stab=[0, 1]))
    return cases


def _fqz_records(rng, n=24):
    recs = []
    for i in range(n):
        ln = int(rng.integers(1, 120))
        recs.append(bytes(rng.integers(0, 41, size=ln,
                                       dtype=np.uint8)))
    recs.append(recs[0])   # dedup candidate
    recs.append(b"")
    return recs


def _sig(p):
    """Encoder kwargs -> a picklable id string."""
    return str(sorted(p.keys()))


@pytest.mark.parametrize("case", _fqz_param_matrix(), ids=_sig)
def test_fqz_matrix_roundtrip_and_fuzz(case):
    rng = np.random.default_rng(17)
    pyrandom = random.Random(17)
    recs = _fqz_records(rng)
    kwargs = dict(case)
    if "stab" not in kwargs:
        kwargs.setdefault("revs", [i % 3 == 0 for i in range(len(recs))])
    blob = fqzcomp.encode(recs, **kwargs)
    out_size = sum(len(r) for r in recs)
    assert fqzcomp.decode(blob, out_size) == b"".join(recs)

    # truncation ladder: every prefix fails cleanly or (rarely, when
    # only trailing pad is lost) still decodes to the exact output
    for cut in range(0, len(blob), max(1, len(blob) // 23)):
        try:
            got = fqzcomp.decode(blob[:cut], out_size)
            assert got == b"".join(recs)
        except BOUNDED:
            pass

    # mutation fuzz: flip bytes anywhere; output must be exact-length
    # bytes or a bounded error
    for trial in range(40):
        b = bytearray(blob)
        for _ in range(pyrandom.randint(1, 4)):
            b[pyrandom.randrange(len(b))] = pyrandom.randrange(256)
        try:
            got = fqzcomp.decode(bytes(b), out_size)
            assert isinstance(got, bytes) and len(got) == out_size
        except BOUNDED:
            pass


def _tok3_names():
    names = [b"read.1/A", b"read.2/A", b"read.10/B",
             b"SRR123.000000001 extra:fields#1",
             b"SRR123.000000002 extra:fields#2",
             b"SRR123.000000002 extra:fields#2",   # exact dup
             b"x" * 200,
             b"0012300", b"0012301", b"99999999999",  # digit edge runs
             b"a-b_c=d,e:f;g|h"]
    return b"\x00".join(names) + b"\x00"


@pytest.mark.parametrize("use_arith", [False, True])
def test_tok3_roundtrip_and_fuzz(use_arith):
    pyrandom = random.Random(23)
    data = _tok3_names()
    blob = tok3.encode(data, use_arith=use_arith)
    assert tok3.decode(blob, len(data)) == data

    for cut in range(0, len(blob), max(1, len(blob) // 23)):
        try:
            got = tok3.decode(blob[:cut], len(data))
            assert got == data
        except BOUNDED:
            pass

    for trial in range(60):
        b = bytearray(blob)
        for _ in range(pyrandom.randint(1, 4)):
            b[pyrandom.randrange(len(b))] = pyrandom.randrange(256)
        try:
            got = tok3.decode(bytes(b), len(data))
            assert isinstance(got, bytes)
        except BOUNDED:
            pass


def test_fqz_native_python_differential(monkeypatch):
    """The C entropy core and the pure-Python model must agree byte for
    byte on randomized streams across the parameter matrix."""
    from meryl_tpu import native
    if not native.available():
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(29)
    for case in _fqz_param_matrix():
        recs = _fqz_records(rng)
        blob = fqzcomp.encode(recs, **dict(case))
        out_size = sum(len(r) for r in recs)
        got_native = fqzcomp.decode(blob, out_size)
        monkeypatch.setenv("MERYL_TPU_NO_NATIVE", "1")
        native._lib = None
        native._tried = False
        try:
            got_py = fqzcomp.decode(blob, out_size)
        finally:
            monkeypatch.delenv("MERYL_TPU_NO_NATIVE")
            native._lib = None
            native._tried = False
        assert got_native == got_py == b"".join(recs)


def test_tok3_native_python_differential(monkeypatch):
    from meryl_tpu import native
    if not native.available():
        pytest.skip("native core unavailable")
    data = _tok3_names()
    for use_arith in (False, True):
        blob = tok3.encode(data, use_arith=use_arith)
        got_native = tok3.decode(blob, len(data))
        monkeypatch.setenv("MERYL_TPU_NO_NATIVE", "1")
        native._lib = None
        native._tried = False
        try:
            got_py = tok3.decode(blob, len(data))
        finally:
            monkeypatch.delenv("MERYL_TPU_NO_NATIVE")
            native._lib = None
            native._tried = False
        assert got_native == got_py == data
