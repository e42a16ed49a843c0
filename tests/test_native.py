"""Native C++ scanner vs pure-python parser equivalence."""

import gzip

import numpy as np
import pytest

from meryl_tpu import native
from meryl_tpu.kmer import CODE_LUT
from meryl_tpu.io.sequence import homopoly_compress_bytes, iter_sequences

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _python_codes(path, hpc=False):
    parts = []
    for _, seq, _ in iter_sequences(path):
        if hpc:
            seq = homopoly_compress_bytes(seq)
        if seq:
            parts.append(CODE_LUT[np.frombuffer(seq, np.uint8)])
        parts.append(np.full(1, 255, np.uint8))
    return np.concatenate(parts) if parts else np.zeros(0, np.uint8)


def _native_codes(path, hpc=False, block=1 << 22):
    parts = list(native.scan_codes(path, hpc=hpc, block=block))
    return np.concatenate(parts) if parts else np.zeros(0, np.uint8)


def test_fasta_multiline(tmp_path):
    fa = tmp_path / "a.fa"
    fa.write_text(">s1 desc\nACGTacgtNNGG\nTTTT\n>s2\nGGGG\n")
    assert (_native_codes(str(fa)) == _python_codes(str(fa))).all()


def test_fastq(tmp_path):
    fq = tmp_path / "a.fq"
    fq.write_text("@r1\nACGTN\n+\nIIIII\n@r2 x\nGGTT\n+r2\n@@@@\n")
    got = _native_codes(str(fq))
    want = _python_codes(str(fq))
    assert (got == want).all()


def test_fastq_qual_with_at_sign(tmp_path):
    # quality line starting with '@' must not be mistaken for a header
    fq = tmp_path / "a.fq"
    fq.write_text("@r1\nACGT\n+\n@AB@\n@r2\nTTGG\n+\n!!!!\n")
    assert (_native_codes(str(fq)) == _python_codes(str(fq))).all()


def test_gzip_and_small_blocks(tmp_path):
    fa = tmp_path / "a.fa.gz"
    body = ">s1\n" + "ACGTTGCA" * 100 + "\n>s2\n" + "GATTACA" * 50 + "\n"
    with gzip.open(fa, "wt") as f:
        f.write(body)
    want = _python_codes(str(fa))
    for block in (7, 64, 1 << 20):  # boundary-splitting stress
        assert (_native_codes(str(fa), block=block) == want).all()


def test_hpc(tmp_path):
    fa = tmp_path / "a.fa"
    fa.write_text(">s\nAAACCCgggTTTAaA\n>t\nGGGGG\n")
    assert (_native_codes(str(fa), hpc=True) ==
            _python_codes(str(fa), hpc=True)).all()


def test_counting_through_native(tmp_path):
    """count_to_arrays with the native scanner active must match oracle."""
    from meryl_tpu import oracle, kmer as km
    from meryl_tpu.counter import count_to_arrays
    rng = np.random.default_rng(9)
    seqs = ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=700)),
            "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=300))]
    fa = tmp_path / "r.fa"
    fa.write_text("".join(f">q{i}\n{s}\n" for i, s in enumerate(seqs)))
    hi, lo, c = count_to_arrays([str(fa)], 11, chunk_len=1 << 12)
    ohi, olo, oc = oracle.count_kmers(seqs, 11)
    assert (hi == ohi).all() and (lo == olo).all() and (c == oc).all()


def test_fastq_multiline_seq_and_qual(tmp_path):
    """Robust FASTQ (VERDICT r1 missing #7): sequence spans lines until
    the '+' line; quality spans lines until its length matches, so '@'
    and '+' first quality chars don't start new records."""
    fq = tmp_path / "m.fq"
    fq.write_text(
        "@r1 desc\nACGTACGT\nAACC\n+\n@@@@IIII\n+AAA\n"
        "@r2\nGGTT\n+r2\n@+@I\n"
        "@r3\nACGTA\nCGT\n+\nIIIIIIII\n")
    want_seqs = [b"ACGTACGTAACC", b"GGTT", b"ACGTACGT"]
    got = [s for _, s, _ in iter_sequences(str(fq))]
    assert got == want_seqs
    assert (_native_codes(str(fq)) == _python_codes(str(fq))).all()


def test_fastq_multiline_tiny_blocks(tmp_path):
    """State machine boundaries: multi-line records split across 7-byte
    scanner feeds."""
    fq = tmp_path / "t.fq"
    fq.write_text("@a\nACGT\nACGT\n+\n@IIIIII\nI\n@b\nTTTT\n+\nIIII\n")
    a = _native_codes(str(fq), block=7)
    b = _python_codes(str(fq))
    assert (a == b).all()


def test_fastq_crlf_multiline_qual(tmp_path):
    """CRLF line endings with multi-line quality: '\r' must not count
    toward the quality-length budget (regression: quality bytes were
    emitted as phantom bases)."""
    fq = tmp_path / "crlf.fq"
    fq.write_bytes(b"@r1\r\nACGTACGT\r\nAAAA\r\n+\r\nIIII\r\nIIII\r\n"
                   b"IIII\r\n@r2\r\nGGTT\r\n+\r\nACGT\r\n")
    got = _native_codes(str(fq))
    want = _python_codes(str(fq))
    assert (got == want).all()


def test_merge_kway_matches_cascade_and_numpy():
    """merge_kway (loser tree, hierarchical groups, range-partitioned
    threads) against merge_cascade and a numpy reference, across
    fan-ins that hit the single, partitioned, and grouped paths."""
    import numpy as np

    from meryl_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(42)
    for nruns, size in [(1, 100), (2, 1000), (5, 20000), (300, 400),
                        (600, 300)]:
        runs = []
        for _ in range(nruns):
            v = np.unique(rng.integers(0, 30000, size=size,
                                       dtype=np.uint64))
            h = (v & np.uint64(1))
            o = np.lexsort((v, h))
            runs.append((h[o], v[o],
                         rng.integers(1, 9, size=len(v))
                         .astype(np.uint64)))
        got = native.merge_kway(runs, threads=3)
        want = native.merge_cascade(runs, threads=1)
        for x, y in zip(want, got):
            assert (x == y).all(), (nruns, size)
        # numpy reference on the smaller configs
        if nruns * size <= 200000:
            agg = {}
            for hh, ll, cc in runs:
                for a, b, c in zip(hh, ll, cc):
                    agg[(int(a), int(b))] = \
                        agg.get((int(a), int(b)), 0) + int(c)
            keys = sorted(agg)
            assert [tuple(map(int, t)) for t in
                    zip(got[0], got[1])] == keys
            assert [int(c) for c in got[2]] == [agg[k] for k in keys]


def test_merge_kway_u64_path_variants():
    """The u64-key kernel engages when hi is one constant; verify
    constant-zero, constant-nonzero, and hi-varying (128-bit fallback)
    all match the cascade."""
    import numpy as np

    from meryl_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)

    def mk(nr, hi_fn):
        runs = []
        for _ in range(nr):
            v = np.unique(rng.integers(0, 50000, size=3000,
                                       dtype=np.uint64))
            h = hi_fn(v)
            o = np.lexsort((v, h))
            runs.append((h[o], v[o],
                         rng.integers(1, 9, size=len(v))
                         .astype(np.uint64)))
        return runs

    for hi_fn in (lambda v: np.zeros(len(v), np.uint64),
                  lambda v: np.full(len(v), 7, np.uint64),
                  lambda v: v & np.uint64(1)):
        runs = mk(20, hi_fn)
        want = native.merge_cascade(runs)
        got = native.merge_kway(runs, threads=3)
        for x, y in zip(want, got):
            assert (x == y).all()


def test_merge_kway_all_ones_kmer_not_dropped():
    """The kernels key exhausted cursors as all-ones; a REAL all-ones
    kmer (k=64 poly-T, forward mode) must survive the merge (regression:
    it terminated the tournament early and its count vanished)."""
    import numpy as np

    from meryl_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    M = np.uint64(0xFFFFFFFFFFFFFFFF)
    rng = np.random.default_rng(11)

    def mk(nr, with_inf, hi_const=None):
        runs = []
        for i in range(nr):
            v = np.unique(rng.integers(0, 5000, size=800,
                                       dtype=np.uint64))
            h = (np.full(len(v), hi_const, np.uint64)
                 if hi_const is not None else v & np.uint64(1))
            o = np.lexsort((v, h))
            h, v = h[o], v[o]
            c = rng.integers(1, 9, size=len(v)).astype(np.uint64)
            if with_inf(i):
                h = np.append(h, M)
                v = np.append(v, M)
                c = np.append(c, np.uint64(2 + i))
            runs.append((h, v, c))
        return runs

    # 128-bit path, one / several / all runs carrying the all-ones kmer
    for sel in (lambda i: i == 0, lambda i: i % 2 == 0, lambda i: True):
        runs = mk(5, sel)
        want = native.merge_cascade(runs)
        got = native.merge_kway(runs, threads=3)
        assert got[0][-1] == M and got[1][-1] == M
        for x, y in zip(want, got):
            assert (x == y).all()

    # u64 path (constant hi = all-ones after stripping)
    runs = mk(6, lambda i: i < 3, hi_const=int(M))
    want = native.merge_cascade(runs)
    got = native.merge_kway(runs, threads=2)
    for x, y in zip(want, got):
        assert (x == y).all()

    # every run is ONLY the all-ones kmer
    runs = [(np.array([M]), np.array([M]),
             np.array([3], np.uint64)) for _ in range(4)]
    hi, lo, c = native.merge_kway(runs)
    assert list(hi) == [M] and list(lo) == [M] and list(c) == [12]


def _messy_fasta(path, n_rec=400, seed=5):
    """Multi-line records, lowercase, N runs, CRLF lines, empty
    comment-ish lines between records."""
    import random
    rng = random.Random(seed)
    with open(path, "w", newline="") as f:
        for i in range(n_rec):
            f.write(f">rec{i} extra descr\n")
            total = rng.randrange(50, 900)
            seq = "".join(rng.choice("ACGTacgtN") for _ in range(total))
            w = rng.choice([37, 60, 80])
            eol = "\r\n" if i % 7 == 0 else "\n"
            for j in range(0, total, w):
                f.write(seq[j:j + w] + eol)


@pytest.mark.parametrize("hpc", [False, True])
def test_parallel_fasta_scan_matches_serial(tmp_path, hpc):
    """Record-parallel FASTA scan == stateful serial scan, across span
    boundaries that land mid-record (tiny span_bytes forces many
    spans; '>' alignment must make them invisible)."""
    p = str(tmp_path / "m.fa")
    _messy_fasta(p)
    serial = _native_codes(p, hpc=hpc)
    par = list(native.scan_codes_parallel(p, hpc=hpc, span_bytes=4096,
                                          threads=4))
    assert len(par) > 4  # actually exercised multiple spans
    got = np.concatenate(par)
    assert np.array_equal(got, serial)
    # single-thread fallback path
    one = np.concatenate(list(native.scan_codes_parallel(
        p, hpc=hpc, span_bytes=1 << 30, threads=4)))
    assert np.array_equal(one, serial)


def test_parallel_scan_eligibility(tmp_path, monkeypatch):
    fa = tmp_path / "a.fa"
    fa.write_text(">r\nACGT\n")
    assert not native._parallel_scan_eligible(str(fa))  # below floor
    assert native._parallel_scan_eligible(str(fa), min_bytes=1)
    fq = tmp_path / "a.fq"
    fq.write_text("@r\nACGT\n+\nIIII\n")
    assert not native._parallel_scan_eligible(str(fq), min_bytes=1)
    monkeypatch.setenv("MERYL_TPU_PAR_SCAN", "0")
    assert not native._parallel_scan_eligible(str(fa), min_bytes=1)


def test_parallel_fasta_counting_equality(tmp_path, monkeypatch):
    """count_to_arrays through a forced-parallel scan equals the
    serial-scan result (the SequenceChunker consumes the same code
    stream either way)."""
    import functools

    from meryl_tpu.counter import count_to_arrays
    p = str(tmp_path / "c.fa")
    _messy_fasta(p, n_rec=60, seed=9)
    a = count_to_arrays([p], 17)          # serial (file below floor)
    monkeypatch.setattr(native, "_parallel_scan_eligible",
                        lambda path, min_bytes=0: True)
    monkeypatch.setattr(native, "scan_codes_parallel",
                        functools.partial(native.scan_codes_parallel,
                                          span_bytes=2048, threads=3))
    b = count_to_arrays([p], 17)          # forced-parallel, many spans
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_multifile_parallel_ingest_equality(tmp_path, monkeypatch):
    """Counting over many files with the concurrent multi-file ingest
    equals the serial stream: blocks interleave only at sequence
    boundaries, so the sorted union-sum is interleaving-invariant."""
    import random

    from meryl_tpu.counter import count_to_arrays
    random.seed(31)
    paths = []
    for i in range(5):
        fq = tmp_path / f"r{i}.fq.gz"
        recs = "".join(
            f"@x{j}\n{''.join(random.choices('ACGTN', k=211))}\n+\n"
            f"{'I' * 211}\n" for j in range(120))
        with gzip.open(fq, "wt") as f:
            f.write(recs)
        paths.append(str(fq))
    # one long multi-line FASTA sequence to exercise the no-SEP carry
    fa = tmp_path / "long.fa"
    body = "".join(random.choices("ACGT", k=9000))
    fa.write_text(">long\n" + "\n".join(
        body[i:i + 70] for i in range(0, len(body), 70)) + "\n")
    paths.append(str(fa))

    monkeypatch.setenv("MERYL_TPU_PAR_FILES", "0")
    a = count_to_arrays(paths, 19, chunk_len=1 << 12)
    monkeypatch.setenv("MERYL_TPU_PAR_FILES", "1")
    b = count_to_arrays(paths, 19, chunk_len=1 << 12)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    # reversed path order too (pure interleave robustness)
    c = count_to_arrays(paths[::-1], 19, chunk_len=1 << 12)
    assert all(np.array_equal(x, y) for x, y in zip(a, c))


def test_multifile_parallel_worker_error(tmp_path, monkeypatch):
    """A broken file among many must surface the worker's exception,
    not hang the consumer or the pool."""
    from meryl_tpu.io.sequence import SequenceChunker
    good = tmp_path / "g.fa"
    good.write_text(">r\n" + "ACGT" * 200 + "\n")
    bad = tmp_path / "b.fa.gz"
    bad.write_bytes(b"\x1f\x8b\x08\x00garbage-not-gzip-body")
    monkeypatch.setenv("MERYL_TPU_PAR_FILES", "1")
    ch = SequenceChunker([str(good), str(bad), str(good)], 11, 1 << 12)
    with pytest.raises(Exception):
        list(ch)


def test_multifile_deterministic_flag_serializes(tmp_path, monkeypatch):
    """deterministic=True must keep strict file order (batched-counter
    resume identifies batches by chunk index)."""
    from meryl_tpu.io import sequence as seqmod
    from meryl_tpu.io.sequence import SEP, SequenceChunker
    paths = []
    for i in range(3):
        p = tmp_path / f"{i}.fa"
        p.write_text(f">s{i}\n" + "ACGT"[i] * 40 + "\n")
        paths.append(str(p))
    monkeypatch.setenv("MERYL_TPU_PAR_FILES", "1")
    ch = SequenceChunker(paths, 5, 1 << 10, deterministic=True)
    stream = np.concatenate(list(ch._code_stream()))
    codes = stream[stream != SEP]
    # file order preserved: all 0s, then 1s, then 2s (T=2 is code 2?)
    from meryl_tpu.kmer import CODE_LUT
    want = np.concatenate([
        np.full(40, CODE_LUT[ord("ACGT"[i])], np.uint8)
        for i in range(3)])
    assert np.array_equal(codes, want)
