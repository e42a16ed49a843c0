"""Bucket-group batching of the merge phase (VERDICT r1 item 10): one
padded dispatch evaluates many buckets, output unchanged."""

import numpy as np
import pytest

from meryl_tpu import kmer as km, oracle
from meryl_tpu.db import MerylDB
from meryl_tpu import optree
from meryl_tpu.optree import DBInput, OpNode, bucket_groups, execute_root

K = 11


@pytest.fixture()
def dbs(tmp_path):
    rng = np.random.default_rng(17)
    paths = []
    for i, n in enumerate((4000, 2500)):
        seq = "".join(km.ALPHABET[c] for c in rng.integers(0, 4, size=n))
        hi, lo, c = oracle.count_kmers([seq], K)
        p = str(tmp_path / f"db{i}.meryl")
        MerylDB.write(p, K, hi, lo, c)
        paths.append(p)
    return paths


def test_batched_groups_cover_all_buckets(dbs):
    node = OpNode(op="union-sum", inputs=[DBInput(p) for p in dbs])
    groups = bucket_groups(node)
    flat = [ff for g in groups for ff in g]
    assert flat == list(range(64))
    # small DBs pack into a single dispatch group
    assert len(groups) == 1


def test_batched_output_equals_per_bucket(dbs, tmp_path, monkeypatch):
    node = OpNode(op="union-sum", inputs=[DBInput(p) for p in dbs],
                  output_path=str(tmp_path / "batched.meryl"))
    calls = []
    orig = optree.setops.merge_op

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(optree.setops, "merge_op", spy)
    db_b = execute_root(node, K)
    assert len(calls) == 1  # 64 buckets, one dispatch

    monkeypatch.setenv("MERYL_TPU_SETOP_BATCH", "1")
    node2 = OpNode(op="union-sum", inputs=[DBInput(p) for p in dbs],
                   output_path=str(tmp_path / "perbucket.meryl"))
    calls.clear()
    db_p = execute_root(node2, K)
    assert len(calls) > 16  # (nearly) per-bucket dispatching

    a = db_b.load_all()
    b = db_p.load_all()
    for x, y in zip(a, b):
        assert x.tolist() == y.tolist()

    # and the batched result matches the naive model
    da = {}
    for p in dbs:
        hi, lo, c = MerylDB.open(p).load_all()
        for h, l, v in zip(hi, lo, c):
            kk = (int(h) << 64) | int(l)
            da[kk] = da.get(kk, 0) + int(v)
    hi, lo, c = a
    got = {(int(h) << 64) | int(l): int(v) for h, l, v in zip(hi, lo, c)}
    assert got == da
