"""Analytic counting tests on periodic sequences.

Mirrors the reference's test-build.pl (synthetic A/AC/ACG/ACGT repeats
with analytically known counts, /root/reference/src/tests/test-build.pl:
10-60): a sequence of N copies of period p yields known window counts.
"""

import numpy as np
import pytest

from meryl_tpu import kmer as km
from meryl_tpu.counter import count_to_arrays

K = 11


def _count(seq, tmp_path, k=K, **kw):
    fa = tmp_path / "p.fa"
    fa.write_text(f">p\n{seq}\n")
    return count_to_arrays([str(fa)], k, chunk_len=1 << 12, **kw)


def test_poly_a(tmp_path):
    """A^N: one distinct canonical kmer (AAA..A), count N-k+1."""
    N = 300
    hi, lo, c = _count("A" * N, tmp_path)
    assert len(c) == 1
    assert int(lo[0]) == 0  # AAAA... encodes to 0
    assert int(c[0]) == N - K + 1


def test_ac_repeat(tmp_path):
    """(AC)^N with odd k: two distinct kmers (phases), each with a
    known count; both phases are their own canonical strand or map to
    the same pair."""
    N = 150
    seq = "AC" * N
    hi, lo, c = _count(seq, tmp_path)
    n_windows = len(seq) - K + 1
    # analytic: windows alternate between ACACA... and CACAC...
    from collections import Counter
    want = Counter()
    for p in range(n_windows):
        w = seq[p:p + K]
        want[km.canonical_kmer(km.string_to_kmer(w), K)] += 1
    got = {(int(h) << 64) | int(l): int(v) for h, l, v in zip(hi, lo, c)}
    assert got == dict(want)
    assert sum(c) == n_windows
    assert len(c) <= 2


def test_acgt_repeat(tmp_path):
    """(ACGT)^N: 4 phases; ACGT is revcomp-closed, so canonical forms
    collapse phases."""
    N = 100
    seq = "ACGT" * N
    hi, lo, c = _count(seq, tmp_path)
    n_windows = len(seq) - K + 1
    assert sum(c) == n_windows
    assert len(c) <= 4
    from collections import Counter
    want = Counter()
    for p in range(n_windows):
        want[km.canonical_kmer(km.string_to_kmer(seq[p:p + K]), K)] += 1
    got = {(int(h) << 64) | int(l): int(v) for h, l, v in zip(hi, lo, c)}
    assert got == dict(want)


def test_acg_repeat_k_multiple_of_period(tmp_path):
    """(ACG)^N with k=12 (multiple of 3): exactly 3 distinct forward
    kmers, counts N*3-12+1 split by phase."""
    N = 120
    seq = "ACG" * N
    hi, lo, c = _count(seq, tmp_path, k=12)
    n_windows = len(seq) - 12 + 1
    assert sum(c) == n_windows
    from collections import Counter
    want = Counter()
    for p in range(n_windows):
        want[km.canonical_kmer(km.string_to_kmer(seq[p:p + 12]), 12)] += 1
    got = {(int(h) << 64) | int(l): int(v) for h, l, v in zip(hi, lo, c)}
    assert got == dict(want)
    assert len(c) == len(want) <= 3


def test_high_multiplicity_single_kmer(tmp_path):
    """A long homopolymer exercises large run-length counting."""
    N = 20000
    hi, lo, c = _count("G" * N, tmp_path)
    assert len(c) == 1
    # canonical of GGG... (k odd) is CCC... = min(G-kmer, C-kmer)
    want = km.canonical_kmer(km.string_to_kmer("G" * K), K)
    assert ((int(hi[0]) << 64) | int(lo[0])) == want
    assert int(c[0]) == N - K + 1
