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
