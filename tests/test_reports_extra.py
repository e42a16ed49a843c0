"""printACGT, print-to-file, lookup -estimate/-memory coverage."""

import io

import numpy as np
import pytest

from meryl_tpu import cli, kmer as km, oracle, lookup_cli
from meryl_tpu.db import MerylDB

K = 9


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    root = tmp_path_factory.mktemp("rep")
    rng = np.random.default_rng(8)
    seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=1500))
    hi, lo, c = oracle.count_kmers([seq], K)
    p = str(root / "r.meryl")
    MerylDB.write(p, K, hi, lo, c)
    want = {km.kmer_to_string((int(h) << 64) | int(l), K): int(v)
            for h, l, v in zip(hi, lo, c)}
    return p, want


def test_print_acgt(db, capsys):
    p, want = db
    rc = cli.main(["printACGT", p])
    assert rc == 0
    out = capsys.readouterr().out.strip().split("\n")
    got = {}
    for l in out:
        s, v = l.split("\t")
        got[s] = int(v)
    # each kmer re-canonicalized under plain lexicographic order
    want_acgt = {}
    for s, v in want.items():
        want_acgt[min(s, km.revcomp_string(s))] = v
    assert got == want_acgt
    # and the ACTG-canonical set differs for this data (sanity)
    assert set(got) != set(want)


def test_print_to_file(db, tmp_path):
    p, want = db
    out = str(tmp_path / "dump.txt")
    rc = cli.main(["print", out, p])
    assert rc == 0
    got = {}
    for l in open(out).read().strip().split("\n"):
        s, v = l.split("\t")
        got[s] = int(v)
    assert got == want


def test_lookup_estimate(db, capsys, tmp_path):
    p, _ = db
    qfa = tmp_path / "q.fa"
    qfa.write_text(">q\nACGTACGTACGTACGT\n")
    with pytest.raises(SystemExit) as e:
        g = lookup_cli.parse_args(["-existence", "-sequence", str(qfa),
                                   "-mers", p, "-estimate"])
        lookup_cli.load_tables(g)
    assert e.value.code == 0
    assert "Estimated memory" in capsys.readouterr().err


def test_lookup_memory_limit(db, tmp_path):
    p, _ = db
    g = lookup_cli.parse_args(["-existence", "-sequence", "x",
                               "-mers", p, "-memory", "0.0000001"])
    with pytest.raises(SystemExit):
        lookup_cli.load_tables(g)


def test_histogram_file_input_ploidy(db, tmp_path, capsys):
    """ploidy accepts a histogram text file input."""
    p, want = db
    hist = tmp_path / "h.tsv"
    from collections import Counter
    cc = Counter(want.values())
    hist.write_text("".join(f"{v}\t{cc[v]}\n" for v in sorted(cc)))
    rc = cli.main(["ploidy", str(hist)])
    assert rc == 0
