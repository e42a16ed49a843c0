"""Out-of-core batched counting + restartable manifest tests."""

import json
import os

import numpy as np

from meryl_tpu import kmer as km, oracle
from meryl_tpu.counter import configure_counting, count_to_db_batched
from meryl_tpu.db import MerylDB

K = 9


def _fasta(tmp_path, seqs, name="r.fa"):
    p = tmp_path / name
    p.write_text("".join(f">q{i}\n{s}\n" for i, s in enumerate(seqs)))
    return str(p)


def _mkseqs(n, count, seed=0):
    rng = np.random.default_rng(seed)
    return ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=n))
            for _ in range(count)]


def test_batched_matches_oracle(tmp_path):
    seqs = _mkseqs(700, 6)
    fa = _fasta(tmp_path, seqs)
    out = str(tmp_path / "b.meryl")
    db = count_to_db_batched([fa], out, K, chunk_len=1 << 11,
                             batch_bases=1500)
    hi, lo, c = db.load_all()
    ohi, olo, oc = oracle.count_kmers(seqs, K)
    assert (hi == ohi).all() and (lo == olo).all() and (c == oc).all()
    # partials and manifest cleaned up
    assert not os.path.exists(out + ".manifest.json")
    assert not os.path.exists(out + ".batch0")


def test_batched_single_batch(tmp_path):
    seqs = _mkseqs(400, 2)
    fa = _fasta(tmp_path, seqs)
    out = str(tmp_path / "s.meryl")
    db = count_to_db_batched([fa], out, K, chunk_len=1 << 11,
                             batch_bases=10**9)
    ohi, olo, oc = oracle.count_kmers(seqs, K)
    hi, lo, c = db.load_all()
    assert (c == oc).all() and (lo == olo).all()


def test_batched_resume_skips_done(tmp_path):
    seqs = _mkseqs(700, 6, seed=3)
    fa = _fasta(tmp_path, seqs)
    out = str(tmp_path / "r.meryl")
    # simulate a prior run that completed batch 0 with wrong data: the
    # resume must trust it (idempotent restart), proving the skip works
    manifest = {"k": K, "mode": "canonical", "hpc": False,
                "batch_bases": 1500, "chunk_len": 1 << 11,
                "segment": None, "done": [0]}
    with open(out + ".manifest.json", "w") as f:
        json.dump(manifest, f)
    z = np.zeros(0, np.uint64)
    MerylDB.write(out + ".batch0", K, z, z.copy(), np.zeros(0, np.uint32))
    db = count_to_db_batched([fa], out, K, chunk_len=1 << 11,
                             batch_bases=1500, resume=True)
    hi, lo, c = db.load_all()
    # batch 0's kmers are missing by construction; later batches present
    ohi, olo, oc = oracle.count_kmers(seqs, K)
    full = {(int(h) << 64) | int(l) for h, l in zip(ohi, olo)}
    got = {(int(h) << 64) | int(l) for h, l in zip(hi, lo)}
    assert got and got < full


def test_batched_no_resume_on_chunk_len_change(tmp_path):
    """A manifest from a run with a DIFFERENT chunk size must be
    ignored: batch boundaries are counted in chunks, so 'batch 0'
    denotes a different base range (regression: resuming across a
    chunk-size change silently skipped/double-counted ranges)."""
    seqs = _mkseqs(700, 6, seed=4)
    fa = _fasta(tmp_path, seqs)
    out = str(tmp_path / "c.meryl")
    manifest = {"k": K, "mode": "canonical", "hpc": False,
                "batch_bases": 1500, "chunk_len": 1 << 12,
                "segment": None, "done": [0]}
    with open(out + ".manifest.json", "w") as f:
        json.dump(manifest, f)
    z = np.zeros(0, np.uint64)
    MerylDB.write(out + ".batch0", K, z, z.copy(), np.zeros(0, np.uint32))
    db = count_to_db_batched([fa], out, K, chunk_len=1 << 11,
                             batch_bases=1500, resume=True)
    hi, lo, c = db.load_all()
    ohi, olo, oc = oracle.count_kmers(seqs, K)
    assert (hi == ohi).all() and (lo == olo).all() and (c == oc).all()


def test_batched_respects_segment(tmp_path):
    """segment= must reach the batched path's chunker (regression: it
    was dropped, so every segment job counted ALL sequences)."""
    seqs = _mkseqs(700, 6, seed=5)
    fa = _fasta(tmp_path, seqs)
    dbs = []
    for a in (1, 2):
        out = str(tmp_path / f"seg{a}.meryl")
        dbs.append(count_to_db_batched([fa], out, K, chunk_len=1 << 11,
                                       batch_bases=1500, segment=(a, 2)))
    # union-sum of the two segments == full count
    tot = {}
    for db in dbs:
        hi, lo, c = db.load_all()
        for h, l, v in zip(hi, lo, c):
            kk = (int(h) << 64) | int(l)
            tot[kk] = tot.get(kk, 0) + int(v)
    ohi, olo, oc = oracle.count_kmers(seqs, K)
    want = {(int(h) << 64) | int(l): int(v)
            for h, l, v in zip(ohi, olo, oc)}
    assert tot == want
    # and each segment alone is a strict subset (it did NOT count all)
    hi, lo, c = dbs[0].load_all()
    assert int(c.sum()) < int(oc.sum())


def test_configure_counting(tmp_path):
    seqs = _mkseqs(500, 4)
    fa = _fasta(tmp_path, seqs)
    plan = configure_counting([fa], 21, memory_gb=0.000001)
    assert plan["expected_kmers"] > 0
    assert plan["batches"] > 1
    plan2 = configure_counting([fa], 21, memory_gb=64)
    assert plan2["batches"] == 1


def test_batched_device_acc_matches(tmp_path, monkeypatch):
    """Round 4: each batch rides the device accumulator (forced via
    MERYL_TPU_DEVICE_ACC=1) — the partial DBs and final union must be
    identical to the host-merge batched path."""
    monkeypatch.setenv("MERYL_TPU_CHUNK", str(1 << 14))
    fa = tmp_path / "r.fa"
    rng = np.random.default_rng(33)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, 400))
            for _ in range(60)]
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))

    out1 = str(tmp_path / "host.meryl")
    monkeypatch.setenv("MERYL_TPU_DEVICE_ACC", "0")
    db1 = count_to_db_batched(
        [str(fa)], out1, 21, chunk_len=1 << 14, batch_bases=6000)
    r1 = db1.load_all()

    out2 = str(tmp_path / "acc.meryl")
    monkeypatch.setenv("MERYL_TPU_DEVICE_ACC", "1")
    db2 = count_to_db_batched(
        [str(fa)], out2, 21, chunk_len=1 << 14, batch_bases=6000)
    r2 = db2.load_all()
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a, b)


def test_batched_device_acc_salvage_midbatch(tmp_path, monkeypatch):
    """AccCapacity mid-batch: the batch salvages exactly and finishes
    on the host path; result still equals the host-merge reference."""
    monkeypatch.setenv("MERYL_TPU_CHUNK", str(1 << 13))
    fa = tmp_path / "r.fa"
    rng = np.random.default_rng(34)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, 500))
            for _ in range(40)]
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))

    out1 = str(tmp_path / "host.meryl")
    monkeypatch.setenv("MERYL_TPU_DEVICE_ACC", "0")
    r1 = count_to_db_batched(
        [str(fa)], out1, 21, chunk_len=1 << 13,
        batch_bases=9000).load_all()

    out2 = str(tmp_path / "acc.meryl")
    monkeypatch.setenv("MERYL_TPU_DEVICE_ACC", "1")
    monkeypatch.setenv("MERYL_TPU_ACC_CAP_GB", "0.000002")  # ~2 KB
    r2 = count_to_db_batched(
        [str(fa)], out2, 21, chunk_len=1 << 13,
        batch_bases=9000).load_all()
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a, b)
