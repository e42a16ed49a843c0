"""meryl-lookup through the BULK sort-merge join path (sequence longer
than the 64K-position switchover)."""

import io

import numpy as np
import pytest

from meryl_tpu import kmer as km, oracle, lookup_cli
from meryl_tpu.db import MerylDB

K = 15


def test_existence_bulk_path(tmp_path):
    rng = np.random.default_rng(23)
    genome = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=40000))
    hi, lo, c = oracle.count_kmers([genome], K)
    dbp = str(tmp_path / "g.meryl")
    MerylDB.write(dbp, K, hi, lo, c)

    # one long query (> BULK_MIN positions) half from the genome
    q = genome[5000:45000] + "".join(
        km.ALPHABET[x] for x in rng.integers(0, 4, size=40000))
    assert len(q) - K + 1 > lookup_cli.BULK_MIN
    qfa = tmp_path / "q.fa"
    qfa.write_text(f">q\n{q}\n")

    g = lookup_cli.parse_args(["-existence", "-sequence", str(qfa),
                               "-mers", dbp])
    lookup_cli.load_tables(g)
    out = io.StringIO()
    lookup_cli.cmd_existence(g, out)
    ident, ntotal, nk, nfound = out.getvalue().strip().split("\t")
    assert ident == "q"
    assert int(ntotal) == len(q) - K + 1
    assert int(nk) == len(c)

    # independent model
    d = {(int(h) << 64) | int(l) for h, l in zip(hi, lo)}
    found = 0
    for p in range(len(q) - K + 1):
        w = q[p:p + K]
        f = km.string_to_kmer(w)
        r = km.revcomp_kmer(f, K)
        if f in d or r in d:
            found += 1
    assert int(nfound) == found


def test_palindrome_vectorized_matches_bruteforce():
    """_is_palindrome (blocked sliding-window form) against a literal
    per-position brute force, incl. invalid codes and odd k."""
    import numpy as np

    from meryl_tpu.lookup_cli import _is_palindrome

    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=3000).astype(np.uint8)
    codes[100] = 255  # an N
    comp = {0: 2, 1: 3, 2: 0, 3: 1}
    for k in (4, 6, 7, 16):
        got = _is_palindrome(codes, k)
        npos = len(codes) - k + 1
        want = np.zeros(npos, bool)
        if k % 2 == 0:
            for p in range(npos):
                w = codes[p:p + k]
                want[p] = bool((w <= 3).all() and all(
                    int(w[i]) == comp[int(w[k - 1 - i])] for i in range(k)))
        assert (got == want).all(), k
