"""Graceful error paths: corrupt/missing databases, bad inputs."""

import numpy as np
import pytest

from meryl_tpu import cli, kmer as km, oracle
from meryl_tpu.db import MerylDB


def test_open_missing_db(tmp_path):
    with pytest.raises(FileNotFoundError):
        MerylDB.open(str(tmp_path / "nope.meryl"))


def test_open_bad_magic(tmp_path):
    d = tmp_path / "bad.meryl"
    d.mkdir()
    (d / "merylIndex.json").write_text('{"magic": "wrong"}')
    with pytest.raises(ValueError, match="not a meryl-tpu database"):
        MerylDB.open(str(d))


def test_corrupt_bucket(tmp_path):
    rng = np.random.default_rng(1)
    seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=500))
    hi, lo, c = oracle.count_kmers([seq], 9)
    p = str(tmp_path / "c.meryl")
    db = MerylDB.write(p, 9, hi, lo, c)
    with open(db.bucket_path(0), "r+b") as f:
        f.write(b"GARBAGE!")
    with pytest.raises(ValueError, match="bad bucket magic"):
        db.load_bucket(0)


def test_k_mismatch_bucket(tmp_path):
    rng = np.random.default_rng(2)
    seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=500))
    hi, lo, c = oracle.count_kmers([seq], 9)
    p = str(tmp_path / "k.meryl")
    MerylDB.write(p, 9, hi, lo, c)
    db = MerylDB.open(p)
    db.meta["k"] = 11  # simulate index/bucket disagreement
    with pytest.raises(ValueError, match="k mismatch"):
        db.load_bucket(0)


def test_union_of_mismatched_k(tmp_path, capsys):
    """Combining DBs of different k must fail cleanly."""
    rng = np.random.default_rng(3)
    seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=500))
    p9 = str(tmp_path / "a9.meryl")
    p11 = str(tmp_path / "a11.meryl")
    for k, p in ((9, p9), (11, p11)):
        hi, lo, c = oracle.count_kmers([seq], k)
        MerylDB.write(p, k, hi, lo, c)
    rc = cli.main(["union-sum", p9, p11, "output",
                   str(tmp_path / "u.meryl")])
    assert rc == 1


def test_nonexistent_sequence_file(capsys):
    rc = cli.main(["k=9", "count", "/does/not/exist.fa", "output", "/tmp/x"])
    assert rc == 1


def test_tiny_k_counting(tmp_path):
    """k=1 and k=2 must count end-to-end (regression: prefix6 raised
    OverflowError for 2k < 6)."""
    import numpy as np
    from meryl_tpu import cli
    from meryl_tpu.db import MerylDB
    fa = tmp_path / "t.fa"
    fa.write_text(">r\nACGTACGGA\n")
    for k, want in [(1, {"A": 4, "C": 5}),   # canonical: A<->T, C<->G
                    (2, None)]:
        db = str(tmp_path / f"k{k}.meryl")
        assert cli.main([f"k={k}", "count", str(fa), "output", db]) == 0
        hi, lo, counts = MerylDB.open(db).load_all()
        assert int(counts.sum()) == 9 - k + 1
        if want is not None:
            from meryl_tpu import kmer as km
            got = {km.kmer_to_string(int(l), k): int(c)
                   for l, c in zip(lo, counts)}
            assert got == want
