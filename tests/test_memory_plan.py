"""The counting memory model: memory= is a real bound (VERDICT r1
item 8), the device chunk is sized to HBM, and -C prints both budgets
(the reference's configureCounting analog, merylOp-count.C:299-462)."""

import io
import contextlib

import numpy as np
import pytest

from meryl_tpu import cli, kmer as km, oracle
from meryl_tpu import counter
from meryl_tpu.db import MerylDB

K = 11


@pytest.fixture()
def fasta(tmp_path):
    rng = np.random.default_rng(3)
    seqs = ["".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=4000))]
    fa = str(tmp_path / "r.fa")
    with open(fa, "w") as f:
        f.write(">s\n" + seqs[0] + "\n")
    return fa, seqs


def test_plan_hbm_bounds_device_chunk(fasta):
    fa, _ = fasta
    plan_big = counter.configure_counting(fa, 21, hbm_gb=16.0)
    plan_small = counter.configure_counting(fa, 21, hbm_gb=0.01)
    assert plan_small["chunk_len"] < plan_big["chunk_len"]
    # the chosen chunk's modeled footprint fits half the HBM budget
    assert plan_small["device_chunk_hbm_bytes"] <= 0.01e9 * 0.5
    assert plan_big["device_bytes_per_base"] == \
        counter.device_bytes_per_base(21)
    # wider kmers cost more HBM per base (more planes)
    assert counter.device_bytes_per_base(33) > \
        counter.device_bytes_per_base(21)


def test_plan_memory_bounds_host_batches(fasta):
    fa, _ = fasta
    budget = 20e-6  # 20 kB
    plan = counter.configure_counting(fa, K, memory_gb=budget)
    assert plan["batches"] > 1
    assert plan["host_peak_bytes"] <= budget * 1e9 + \
        plan["host_bytes_per_kmer"]


def test_count_memory_routes_batched(fasta, tmp_path, monkeypatch):
    fa, seqs = fasta
    monkeypatch.setenv("MERYL_TPU_SHARDED", "0")
    calls = []
    real = counter.count_to_db_batched

    def spy(*a, **kw):
        calls.append(kw.get("memory_gb"))
        return real(*a, **kw)

    monkeypatch.setattr(counter, "count_to_db_batched", spy)
    out = str(tmp_path / "m.meryl")
    db = counter.count_to_db(fa, out, K, chunk_len=1024,
                             memory_gb=20e-6)
    assert calls, "memory= did not engage the out-of-core batched path"
    hi, lo, c = db.load_all()
    ohi, olo, oc = oracle.count_kmers(seqs, K)
    assert hi.tolist() == ohi.tolist()
    assert c.tolist() == oc.tolist()


def test_cli_configure_prints_budgets(fasta, tmp_path, capsys):
    fa, _ = fasta
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = cli.main(["-C", f"k={K}", "memory=0.001", "count", fa,
                       "output", str(tmp_path / "x.meryl")])
    assert rc == 0
    text = err.getvalue()
    assert "device_chunk_hbm_bytes" in text
    assert "host_peak_bytes" in text
    assert "batches" in text
