"""Tests for the aux tools: meryl-import, meryl-simple, meryl-analyze,
position-lookup."""

import numpy as np
import pytest

from meryl_tpu import kmer as km
from meryl_tpu import oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.tools import analyze, import_tool, position_lookup, simple

K = 9


def _seq(rng, n):
    return "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=n))


def test_import_basic(tmp_path):
    kf = tmp_path / "kmers.txt"
    kf.write_text("ACGTACGTA 4\nTTTTTTTTT 2\n#7\nCCCCCCCCC\nACGTACGTA 1\n")
    out = str(tmp_path / "imp.meryl")
    rc = import_tool.main(["-k", "9", "-kmers", str(kf), "-output", out])
    assert rc == 0
    db = MerylDB.open(out)
    hi, lo, c = db.load_all()
    got = {km.kmer_to_string((int(h) << 64) | int(l), 9): int(v)
           for h, l, v in zip(hi, lo, c)}
    # canonical forms; values for duplicate kmers summed
    want = {}
    for s, v in [("ACGTACGTA", 4), ("TTTTTTTTT", 2), ("CCCCCCCCC", 7),
                 ("ACGTACGTA", 1)]:
        cs = km.kmer_to_string(km.canonical_kmer(km.string_to_kmer(s), 9), 9)
        want[cs] = want.get(cs, 0) + v
    assert got == want


def test_import_multiset_and_forward(tmp_path):
    kf = tmp_path / "kmers.txt"
    kf.write_text("GGGTTTAAA 1\nGGGTTTAAA 5\n")
    out = str(tmp_path / "ms.meryl")
    rc = import_tool.main(["-k", "9", "-kmers", str(kf), "-output", out,
                           "-multiset", "-forward"])
    assert rc == 0
    db = MerylDB.open(out)
    assert db.multiset
    hi, lo, c = db.load_all()
    assert len(c) == 2
    assert sorted(c.tolist()) == [1, 5]
    s = km.kmer_to_string((int(hi[0]) << 64) | int(lo[0]), 9)
    assert s == "GGGTTTAAA"  # forward orientation kept


def test_simple_matches_oracle(tmp_path):
    rng = np.random.default_rng(1)
    s = _seq(rng, 2000)
    fa = tmp_path / "in.fa"
    fa.write_text(f">s\n{s}\n")
    dump = tmp_path / "out.dump"
    hist = tmp_path / "out.hist"
    mdb = str(tmp_path / "out.meryl")
    rc = simple.main(["-k", str(K), "-S", str(fa), "-D", str(dump),
                      "-H", str(hist), "-M", mdb])
    assert rc == 0
    hi, lo, c = oracle.count_kmers([s], K)
    want_lines = [f"{t}\t{v}" for t, v in
                  zip(km.hilo_to_strings(hi, lo, K), c.tolist())]
    assert dump.read_text().strip().split("\n") == want_lines
    vals, occ = oracle.histogram(c)
    want_h = [f"{v}\t{o}" for v, o in zip(vals.tolist(), occ.tolist())]
    assert hist.read_text().strip().split("\n") == want_h
    db = MerylDB.open(mdb)
    assert db.stats()["numDistinct"] == len(c)


def test_analyze_gc(tmp_path):
    kf = tmp_path / "kmers.txt"
    # GC counts: GGGCCCAAA -> 6 GC, 3 AT; ACGTACGTA -> 4 GC, 5 AT
    kf.write_text("GGGCCCAAA 3\nACGTACGTA 2\n")
    dbp = str(tmp_path / "a.meryl")
    import_tool.main(["-k", "9", "-kmers", str(kf), "-output", dbp,
                      "-forward"])
    rc = analyze.main(["-mers", dbp, "-prefix", str(tmp_path / "out"),
                       "-gc"])
    assert rc == 0
    gc = (tmp_path / "out.GC.hist").read_text().strip().split("\n")
    assert "4\t2\t1" in gc and "6\t3\t1" in gc
    at = (tmp_path / "out.AT.hist").read_text().strip().split("\n")
    assert "5\t2\t1" in at and "3\t3\t1" in at


def test_analyze_ga_runscore():
    codes = analyze._base_codes(
        np.array([0], np.uint64),
        np.array([km.string_to_kmer("GAGACCCGA")], np.uint64), 9)
    # runs over {G,A}: 'GAGA' (4, has both), 'GA' (2, has both) -> 6
    s = analyze._run_score(codes, 3, 0)
    assert s[0] == 6
    # runs over {T,C}: 'CCC' has no T -> 0
    s2 = analyze._run_score(codes, 2, 1)
    assert s2[0] == 0


def test_position_lookup(tmp_path, capsys):
    rng = np.random.default_rng(3)
    ref = _seq(rng, 1200)
    reffa = tmp_path / "ref.fa"
    reffa.write_text(f">r\n{ref}\n")
    hi, lo, c = oracle.count_kmers([ref], K)
    dbp = str(tmp_path / "ref.meryl")
    MerylDB.write(dbp, K, hi, lo, c)

    qfa = tmp_path / "q.fa"
    q1 = ref[200:260]            # fully embedded
    q2 = _seq(rng, 60)           # random (mostly absent)
    qfa.write_text(f">q1\n{q1}\n>q2\n{q2}\n")

    hpq = tmp_path / "out.hpq"
    mpb = tmp_path / "out.mpb"
    rc = position_lookup.main(["-m", dbp, "-s", str(reffa),
                               "-hpq", str(hpq), "-mpb", str(mpb),
                               str(qfa)])
    assert rc == 0
    lines = hpq.read_text().strip().split("\n")
    n1, t1, l1, id1 = lines[0].split("\t")
    assert id1 == "q1" and int(l1) == 60
    assert int(t1) == 60 - K + 1  # every embedded kmer hits
    assert int(n1) >= int(t1)
    # painting: positions 200..251 covered
    paint = {int(p): int(cnt) for p, cnt in
             (l.split() for l in mpb.read_text().strip().split("\n"))}
    assert 200 in paint and 251 in paint


def test_import_decimal_leading_zeros(tmp_path):
    """'007' must parse as decimal 7 (regression: int(s, 0) raised)."""
    from meryl_tpu.tools import import_tool
    from meryl_tpu.db import MerylDB
    kf = tmp_path / "k.txt"
    kf.write_text("AAAAAAAAC 007\n")
    dbp = str(tmp_path / "z.meryl")
    assert import_tool.main(["-k", "9", "-kmers", str(kf), "-output",
                             dbp, "-forward"]) == 0
    _, _, counts = MerylDB.open(dbp).load_all()
    assert counts.tolist() == [7]


def test_import_overlong_keeps_rightmost_k(tmp_path):
    """kmer strings longer than k keep the RIGHT-most k bases: the
    reference pushes every char through a rolling window
    (meryl-import.C:196-197), so the window ends holding the suffix."""
    kf = tmp_path / "long.txt"
    kf.write_text("ACGTTTGGA 3\n")  # 9 bases, k=4 -> window ends at TGGA
    out = str(tmp_path / "long.meryl")
    rc = import_tool.main(["-k", "4", "-kmers", str(kf), "-output", out,
                           "-forward"])
    assert rc == 0
    hi, lo, c = MerylDB.open(out).load_all()
    assert len(c) == 1
    assert km.kmer_to_string(int(lo[0]), 4) == "TGGA"
    assert int(c[0]) == 3
