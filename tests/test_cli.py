"""End-to-end CLI tests: count to DB, set ops, print, reports.

The e2e shape mirrors the reference's meryl-lookup-test.sh golden tests
(build DB from seeded synthetic sequence, print, compare output), with
the oracle counter standing in for golden checksums."""

import numpy as np
import pytest

from meryl_tpu import cli, kmer as km, oracle
from meryl_tpu.db import MerylDB

K = 9


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">seq{i}\n")
            for j in range(0, len(s), 60):
                f.write(s[j:j + 60] + "\n")


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(7)
    seqs_a = ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=3000)),
              "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=800))]
    seqs_b = ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=2500))]
    fa_a = str(root / "a.fasta")
    fa_b = str(root / "b.fasta")
    _write_fasta(fa_a, seqs_a)
    _write_fasta(fa_b, seqs_b)
    db_a = str(root / "a.meryl")
    db_b = str(root / "b.meryl")
    assert cli.main([f"k={K}", "count", fa_a, "output", db_a]) == 0
    assert cli.main([f"k={K}", "count", fa_b, "output", db_b]) == 0
    return dict(root=root, seqs_a=seqs_a, seqs_b=seqs_b,
                db_a=db_a, db_b=db_b)


def _db_dict(path):
    db = MerylDB.open(path)
    hi, lo, c = db.load_all()
    return {(int(h) << 64) | int(l): int(v) for h, l, v in zip(hi, lo, c)}


def _oracle_dict(seqs):
    hi, lo, c = oracle.count_kmers(seqs, K)
    return {(int(h) << 64) | int(l): int(v) for h, l, v in zip(hi, lo, c)}


def test_count_matches_oracle(workspace):
    assert _db_dict(workspace["db_a"]) == _oracle_dict(workspace["seqs_a"])
    assert _db_dict(workspace["db_b"]) == _oracle_dict(workspace["seqs_b"])


def test_union_sum_cli(workspace):
    out = str(workspace["root"] / "u.meryl")
    rc = cli.main(["union-sum", workspace["db_a"], workspace["db_b"],
                   "output", out])
    assert rc == 0
    a = _oracle_dict(workspace["seqs_a"])
    b = _oracle_dict(workspace["seqs_b"])
    want = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert _db_dict(out) == want


def test_print_sorted(workspace, capsys):
    rc = cli.main(["print", workspace["db_a"]])
    assert rc == 0
    lines = capsys.readouterr().out.strip().split("\n")
    want = _oracle_dict(workspace["seqs_a"])
    assert len(lines) == len(want)
    kmers = [l.split("\t")[0] for l in lines]
    assert kmers == sorted(kmers, key=km.string_to_kmer)
    for l in lines:
        s, v = l.split("\t")
        assert want[km.string_to_kmer(s)] == int(v)


def test_print_nested_filter(workspace, capsys):
    rc = cli.main(["print", "[greater-than", "1", workspace["db_a"] + "]"])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    want = {k: v for k, v in _oracle_dict(workspace["seqs_a"]).items() if v > 1}
    got = {}
    if out:
        for l in out.split("\n"):
            s, v = l.split("\t")
            got[km.string_to_kmer(s)] = int(v)
    assert got == want


def test_histogram_report(workspace, capsys):
    rc = cli.main(["histogram", workspace["db_a"]])
    assert rc == 0
    out = capsys.readouterr().out.strip().split("\n")
    vals = np.array([int(v) for v, _ in (l.split("\t") for l in out)])
    occ = np.array([int(o) for _, o in (l.split("\t") for l in out)])
    counts = np.array(list(_oracle_dict(workspace["seqs_a"]).values()))
    wvals, wocc = np.unique(counts, return_counts=True)
    assert (vals == wvals).all() and (occ == wocc).all()


def test_statistics_report(workspace, capsys):
    rc = cli.main(["statistics", workspace["db_a"]])
    assert rc == 0
    out = capsys.readouterr().out
    d = _oracle_dict(workspace["seqs_a"])
    assert f"{len(d)}" in out  # distinct
    n1 = sum(1 for v in d.values() if v == 1)
    assert f"{n1}" in out  # unique


def test_threshold_from_distinct(workspace):
    """distinct=1.0 -> threshold = max value (keeps everything <=)."""
    out = str(workspace["root"] / "dist.meryl")
    rc = cli.main(["at-most", "distinct=0.9999", workspace["db_a"],
                   "output", out])
    assert rc == 0
    assert len(_db_dict(out)) > 0


def test_count_print_without_output(workspace, capsys):
    rc = cli.main([f"k={K}", "count", str(workspace["root"] / "a.fasta"),
                   "print"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().split("\n")
    assert len(lines) == len(_oracle_dict(workspace["seqs_a"]))


def test_compare(workspace, capsys):
    rc = cli.main(["compare", workspace["db_a"], workspace["db_a"]])
    assert rc == 0
    assert capsys.readouterr().out == ""


def test_dump_index(workspace, capsys):
    rc = cli.main(["dumpIndex", workspace["db_a"]])
    assert rc == 0
    assert "k: 9" in capsys.readouterr().out
