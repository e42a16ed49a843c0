"""The product CLI drives multi-chip counting (VERDICT r1 item 2): the
same `meryl count` command must produce decode-identical DBs on the
sharded SPMD path (MERYL_TPU_SHARDED=1, 8 virtual devices) and the
single-stream path."""

import numpy as np
import pytest

from meryl_tpu import cli, kmer as km, oracle
from meryl_tpu.db import MerylDB

K = 15


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")


@pytest.fixture()
def fasta(tmp_path):
    rng = np.random.default_rng(31)
    seqs = ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=n))
            for n in (3000, 1200, 700)]
    fa = str(tmp_path / "reads.fa")
    _write_fasta(fa, seqs)
    return fa, seqs


def test_cli_count_sharded_matches_single(fasta, tmp_path, monkeypatch):
    fa, seqs = fasta
    monkeypatch.setenv("MERYL_TPU_CHUNK", "512")
    db_s = str(tmp_path / "s.meryl")
    db_1 = str(tmp_path / "one.meryl")
    monkeypatch.setenv("MERYL_TPU_SHARDED", "1")
    assert cli.main([f"k={K}", "count", fa, "output", db_s]) == 0
    monkeypatch.setenv("MERYL_TPU_SHARDED", "0")
    assert cli.main([f"k={K}", "count", fa, "output", db_1]) == 0

    hi_s, lo_s, c_s = MerylDB.open(db_s).load_all()
    hi_1, lo_1, c_1 = MerylDB.open(db_1).load_all()
    assert hi_s.tolist() == hi_1.tolist()
    assert lo_s.tolist() == lo_1.tolist()
    assert c_s.tolist() == c_1.tolist()

    # and both match the oracle
    ohi, olo, oc = oracle.count_kmers(seqs, K)
    assert hi_s.tolist() == ohi.tolist()
    assert c_s.tolist() == oc.tolist()

    # stored histogram/statistics agree
    sv, so = MerylDB.open(db_s).histogram()
    ov, oo = np.unique(oc, return_counts=True)
    assert sv.tolist() == ov.tolist()
    assert so.tolist() == oo.tolist()


def test_cli_count_sharded_hpc_and_forward(fasta, tmp_path, monkeypatch):
    fa, seqs = fasta
    monkeypatch.setenv("MERYL_TPU_CHUNK", "512")
    out_s = str(tmp_path / "f_s.meryl")
    out_1 = str(tmp_path / "f_1.meryl")
    monkeypatch.setenv("MERYL_TPU_SHARDED", "1")
    assert cli.main([f"k={K}", "count-forward", "compress", fa,
                     "output", out_s]) == 0
    monkeypatch.setenv("MERYL_TPU_SHARDED", "0")
    assert cli.main([f"k={K}", "count-forward", "compress", fa,
                     "output", out_1]) == 0
    a = MerylDB.open(out_s).load_all()
    b = MerylDB.open(out_1).load_all()
    for x, y in zip(a, b):
        assert x.tolist() == y.tolist()


def test_cli_count_sharded_memory_bound(fasta, tmp_path, monkeypatch):
    """memory= is honored on the sharded path: a tiny bound routes
    through the disk-spill out-of-core path and still produces a DB
    decode-identical to the unbounded single-stream count, with the
    spill directory cleaned up."""
    import os
    fa, seqs = fasta
    monkeypatch.setenv("MERYL_TPU_CHUNK", "512")
    db_m = str(tmp_path / "m.meryl")
    db_1 = str(tmp_path / "one2.meryl")
    monkeypatch.setenv("MERYL_TPU_SHARDED", "1")
    assert cli.main([f"k={K}", "memory=0.000001", "count", fa,
                     "output", db_m]) == 0
    monkeypatch.setenv("MERYL_TPU_SHARDED", "0")
    assert cli.main([f"k={K}", "count", fa, "output", db_1]) == 0
    hi_m, lo_m, c_m = MerylDB.open(db_m).load_all()
    hi_1, lo_1, c_1 = MerylDB.open(db_1).load_all()
    assert (len(c_m) == len(c_1) and (hi_m == hi_1).all()
            and (lo_m == lo_1).all() and (c_m == c_1).all())
    assert not os.path.exists(db_m + ".spills")
