"""meryl2 -m routes counting through the real memory plan: a tiny -m
must force the batched out-of-core path (manifest + partial DBs) with
output equality against unbounded counting (VERDICT r2 item 6;
reference merylGlobals -m, merylGlobals.H:36-80)."""

import numpy as np

from meryl_tpu import kmer as km
from meryl_tpu.db import MerylDB
from meryl_tpu.v2 import cli as v2cli


def _write_reads(path, rng, n=300, ln=120):
    with open(path, "w") as f:
        for i in range(n):
            s = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=ln))
            f.write(f">r{i}\n{s}\n")


def _decode(path):
    db = MerylDB.open(path)
    hi, lo, c = db.load_all()
    return {(int(h) << 64) | int(l): int(v)
            for h, l, v in zip(hi, lo, c)}


def test_v2_m_forces_batched(tmp_path, monkeypatch):
    rng = np.random.default_rng(11)
    reads = str(tmp_path / "reads.fa")
    _write_reads(reads, rng)

    import meryl_tpu.counter as counter
    calls = {}
    orig = counter.count_to_db_batched

    def spy(*a, **kw):
        calls["batched"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(counter, "count_to_db_batched", spy)
    monkeypatch.setenv("MERYL_TPU_CHUNK", str(1 << 14))

    out_plain = str(tmp_path / "plain.meryl")
    v2cli.main(["-k", "15", "count", reads, "output", out_plain])
    assert "batched" not in calls

    out_m = str(tmp_path / "bounded.meryl")
    # expected kmers ~ file bytes; 3e-6 GB bounds the merged set well
    # below that -> plan must pick > 1 batch
    v2cli.main(["-k", "15", "-m", "0.000003", "count", reads,
                "output", out_m])
    assert calls.get("batched"), "-m did not route through the plan"
    assert _decode(out_m) == _decode(out_plain)


def test_v2_m_inline_form(tmp_path):
    rng = np.random.default_rng(12)
    reads = str(tmp_path / "r.fa")
    _write_reads(reads, rng, n=40)
    out = str(tmp_path / "o.meryl")
    v2cli.main(["-k", "15", "-m16", "count", reads, "output", out])
    assert len(_decode(out)) > 0