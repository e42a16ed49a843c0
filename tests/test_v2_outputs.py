"""v2 output kinds: list, sharded ## lists, listACGT, histogram/stats."""

import glob

import numpy as np
import pytest

from meryl_tpu import kmer as km, oracle
from meryl_tpu.db import MerylDB
from meryl_tpu.v2 import cli as v2cli

K = 9


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    root = tmp_path_factory.mktemp("v2out")
    rng = np.random.default_rng(21)
    seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=2500))
    hi, lo, c = oracle.count_kmers([seq], K)
    p = str(root / "a.meryl")
    MerylDB.write(p, K, hi, lo, c)
    want = {km.kmer_to_string((int(h) << 64) | int(l), K): int(v)
            for h, l, v in zip(hi, lo, c)}
    return p, want, root


def test_output_list(db, tmp_path):
    p, want, _ = db
    out = str(tmp_path / "out.txt")
    assert v2cli.main(["union", f"output:list={out}", p]) == 0
    got = {}
    for line in open(out):
        s, v, l = line.split("\t")
        got[s] = int(v)
    assert got == {s: 1 for s in want}  # union of one input: value=#dbs=1


def test_output_list_sharded(db, tmp_path):
    p, want, _ = db
    out = str(tmp_path / "out.##.txt")
    assert v2cli.main(["union-sum", f"o:l={out}", p]) == 0
    files = sorted(glob.glob(str(tmp_path / "out.*.txt")))
    assert len(files) == 64
    got = {}
    for f in files:
        for line in open(f):
            s, v, l = line.split("\t")
            got[s] = int(v)
    assert got == want


def test_output_listacgt_not_sorted_but_complete(db, tmp_path):
    p, want, _ = db
    out = str(tmp_path / "acgt.txt")
    assert v2cli.main(["union-sum", f"output:listACGT={out}", p]) == 0
    got = {}
    for line in open(out):
        s, v, l = line.split("\t")
        got[s] = int(v)
    # every kmer re-canonicalized under plain lexicographic order
    want_acgt = {}
    for s, v in want.items():
        want_acgt[min(s, km.revcomp_string(s))] = v
    assert got == want_acgt


def test_output_histogram_and_statistics(db, tmp_path):
    p, want, _ = db
    h = str(tmp_path / "h.tsv")
    st = str(tmp_path / "s.txt")
    assert v2cli.main(["union-sum", f"o:histogram={h}",
                       f"o:stats={st}", p]) == 0
    vals, occ = np.unique(np.array(list(want.values())), return_counts=True)
    got = {}
    for line in open(h).read().strip().split("\n"):
        a, b = line.split("\t")
        got[int(a)] = int(b)
    assert got == dict(zip(vals.tolist(), occ.tolist()))
    assert str(len(want)) in open(st).read()


def test_output_list_sharded_gz(db, tmp_path):
    """Sharded ## lists honor compression-by-extension like the
    non-sharded path (compressedFileWriter parity, files.H contract)."""
    import gzip
    p, want, _ = db
    out = str(tmp_path / "out.##.txt.gz")
    assert v2cli.main(["union-sum", f"o:l={out}", p]) == 0
    files = sorted(glob.glob(str(tmp_path / "out.*.txt.gz")))
    assert len(files) == 64
    got = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            for line in fh:
                s, v, l = line.split("\t")
                got[s] = int(v)
    assert got == want


def test_output_histogram_gz(db, tmp_path):
    import gzip
    p, want, _ = db
    out = str(tmp_path / "h.txt.gz")
    assert v2cli.main(["union-sum", f"output:histogram={out}", p]) == 0
    from collections import Counter
    wh = Counter(want.values())
    got = {}
    with gzip.open(out, "rt") as fh:
        for line in fh:
            v, o = line.split("\t")
            got[int(v)] = int(o)
    assert got == dict(wh)
